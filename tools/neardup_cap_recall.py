#!/usr/bin/env python
"""Measured recall cost of the near-dup bucket cap (round-4 review fix).

The oversized-bucket split in embedding_near_dup keys sub-buckets by
extra hyperplane sign bits (locality-preserving: a pair at angle theta
is separated with prob ~ bits*theta/pi), with a direction-hash residual
for angularly tight clusters. This experiment quantifies what the cap
actually costs at a tier where the UNCAPPED operator is feasible as
ground truth:

- tier: star-schema embeddings at mult=10 (20k clustered vectors, same
  generator as the sf10 dry-run tier) — per-label buckets collapse just
  like at 100x, but the uncapped per-group gram stays ~ (2k)^2 = 32 MB;
- ground truth: embedding_near_dup(max_bucket=10^9) — every pair the
  LSH banding itself surfaces (banding recall is measured separately in
  BENCH/lsh_curve.json; this isolates the CAP's marginal loss);
- measurement: pair recall of the capped run vs ground truth, split by
  cosine band — the designed tradeoff is high recall where dedup
  thresholds live (>=0.7) and indifference in the 0.4-0.7 bulk.

Writes BENCH/neardup_cap_recall.json.

Usage: python tools/neardup_cap_recall.py [--tier .data/star_sf1]
       [--caps 1024,256] [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default=".data/star_sf1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--caps", default="1024,256")
    ap.add_argument("--out", default="BENCH/neardup_cap_recall.json")
    args = ap.parse_args()

    from docling_nlp_api_spark.session import get_spark
    from docling_nlp_api_spark.operators.dedup import embedding_near_dup

    spark = get_spark("neardup-cap-recall", cores=32)

    emb_path = f"{args.tier}/embeddings.parquet"
    if not os.path.exists(emb_path):
        # generate ONLY the embeddings table at this tier (the full
        # build writes 2 GB of fact tables this experiment never reads)
        from tools.make_star_tier import build_tables

        print(f"generating {emb_path} (mult={args.mult}) ...", flush=True)
        build_tables(spark, args.mult)["embeddings"].write.mode(
            "overwrite"
        ).parquet(emb_path)

    BANDS = [(0.4, 0.7), (0.7, 0.9), (0.9, 1.01)]

    def band_col():
        c = F.col("cosine")
        expr = F.lit(None).cast("string")
        for lo, hi in reversed(BANDS):
            expr = F.when((c >= lo) & (c < hi), F.lit(f"[{lo},{hi})")).otherwise(expr)
        return expr

    def run(cap: int, tag: str):
        t0 = time.time()
        df = (
            embedding_near_dup(spark, args.tier, max_bucket=cap)
            .withColumn("cband", band_col())
        )
        path = f"{args.tier}/_cap_recall_{tag}.parquet"
        df.write.mode("overwrite").parquet(path)
        dt = round(time.time() - t0, 2)
        out = spark.read.parquet(path)
        n = out.count()
        print(f"{tag}: {n} pairs in {dt}s", flush=True)
        return out, n, dt

    truth, n_truth, sec_truth = run(10**9, "uncapped")
    truth_by_band = {
        r["cband"]: r["n"]
        for r in truth.groupBy("cband").agg(F.count("*").alias("n")).collect()
    }

    # n_vectors counts what the operators actually run on — the planted
    # frame (raw + 1-in-25 scaled near-dups), not the raw parquet — so
    # per-vector rates derived from this JSON use the right denominator
    from docling_nlp_api_spark.operators.dedup import with_planted_vec_dups

    report = {
        "tier": args.tier,
        "n_vectors": with_planted_vec_dups(
            spark.read.parquet(emb_path)
        ).count(),
        "n_vectors_raw": spark.read.parquet(emb_path).count(),
        "uncapped": {"pairs": n_truth, "sec": sec_truth,
                     "by_band": truth_by_band},
        "caps": {},
        "note": (
            "ground truth = the uncapped operator (every pair LSH banding "
            "surfaces); recall isolates the bucket-cap split's marginal "
            "loss by cosine band. The sign-bit salt is designed to "
            "concentrate loss in the low-cosine bulk and spare the "
            ">=0.7 bands where dedup thresholds live."
        ),
    }

    def clusters(cap: int, tag: str):
        """RESOLUTION contract: (n_components, n_clustered_vectors, sec).
        The quantity that matters for a dedup keep-set — fragmentation
        of a true cluster keeps extra survivors."""
        from docling_nlp_api_spark.operators.dedup import embedding_dup_clusters

        t0 = time.time()
        cc = embedding_dup_clusters(spark, args.tier, max_bucket=cap)
        agg = cc.agg(
            F.countDistinct("canonical_id").alias("comp"),
            F.count("*").alias("members"),
        ).first()
        dt = round(time.time() - t0, 2)
        print(f"clusters {tag}: {agg['comp']} components / "
              f"{agg['members']} members in {dt}s", flush=True)
        return int(agg["comp"]), int(agg["members"]), dt

    comp_t, mem_t, sec_ct = clusters(10**9, "uncapped")
    report["uncapped"]["components"] = comp_t
    report["uncapped"]["clustered_vectors"] = mem_t
    report["uncapped"]["clusters_sec"] = sec_ct

    for cap_s in args.caps.split(","):
        cap = int(cap_s)
        capped, n_capped, sec_capped = run(cap, f"cap{cap}")
        kept = capped.join(truth.select("id_a", "id_b"), ["id_a", "id_b"], "inner")
        kept_by_band = {
            r["cband"]: r["n"]
            for r in kept.groupBy("cband").agg(F.count("*").alias("n")).collect()
        }
        comp_c, mem_c, sec_cc = clusters(cap, f"cap{cap}")
        # recall = |capped ∩ truth| / |truth| — NOT n_capped / n_truth,
        # which silently inflates (even past 1.0) if the capped run ever
        # emits a pair absent from the uncapped ground truth (e.g. a
        # delegate chain edge); kept_by_band sums over the inner join,
        # so extra capped-only pairs cannot count (round-4 review)
        n_kept = sum(kept_by_band.values())
        report["caps"][cap] = {
            "pairs": n_capped,
            "sec": sec_capped,
            "recall_total": round(n_kept / n_truth, 4) if n_truth else None,
            "recall_by_band": {
                b: round(kept_by_band.get(b, 0) / n, 4)
                for b, n in sorted(truth_by_band.items())
            },
            "components": comp_c,
            "clustered_vectors": mem_c,
            "clusters_sec": sec_cc,
            "component_ratio_vs_uncapped": (
                round(comp_c / comp_t, 4) if comp_t else None
            ),
        }
        print(json.dumps(report["caps"][cap], indent=2), flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
