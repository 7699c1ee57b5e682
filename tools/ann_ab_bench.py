#!/usr/bin/env python
"""A/B bench: the three ANN scorer tiers (sql / pair / kernel) over the
embedding family (round-4 vecmath.py optimization).

Scorer selection is the SPARK_GRAFT_ANN_SCORER env var read at
DataFrame-BUILD time, so one session can interleave both sides
(trial order sql,arrow,sql,arrow,... decorrelates the VM's
noisy-neighbor windows; best-of per side is the capability number,
same protocol as BENCH/BASELINE.md). Timed work = build the query via
__spark_entry__.queries() and drain it with a noop write.

Usage:
  python tools/ann_ab_bench.py                          # sf0.1, both scorers
  python tools/ann_ab_bench.py --sf-dir .data/star_sf10 --scorers arrow \
      --trials 1   # 100x tier, arrow only (sql side = BENCH/sf10.json)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_buckets",
    "ann_lsh_multiprobe_topk",
    "ann_ivf_kmeans_topk",
    "ann_ivf_nprobe2_topk",
    "dedup_embedding_cosine",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scorers", default="sql,pair,kernel")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1,
                    help="0 at large tiers where run time dwarfs startup")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    scorers = args.scorers.split(",")
    out_path = args.out or os.path.join(REPO, "BENCH", "ann_ab.json")

    from __spark_entry__ import queries
    from docling_nlp_api_spark.session import get_spark

    spark = get_spark("ann_ab", cores=args.cores)
    qs = queries()
    n_vecs = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").count()

    results: dict[str, dict[str, list[float]]] = {q: {s: [] for s in scorers} for q in QUERIES}
    # one untimed warm-up per (query, scorer) to exclude JVM/codegen/UDF
    # worker startup, then interleaved timed trials
    for q in QUERIES:
        for s in scorers if args.warmup else []:
            os.environ["SPARK_GRAFT_ANN_SCORER"] = s
            qs[q](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        for _t in range(args.trials):
            for s in scorers:
                os.environ["SPARK_GRAFT_ANN_SCORER"] = s
                t0 = time.time()
                qs[q](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                sec = round(time.time() - t0, 3)
                results[q][s].append(sec)
                print(f"{q} [{s}] trial {_t}: {sec}s", flush=True)

    os.environ.pop("SPARK_GRAFT_ANN_SCORER", None)
    summary = {
        "sf_dir": args.sf_dir,
        "n_vecs": n_vecs,
        "cores": args.cores,
        "queries": {
            q: {
                **{s: {"best": min(v), "trials": v} for s, v in by.items() if v},
                **(
                    {
                        f"speedup_{s}": round(min(by["sql"]) / min(by[s]), 2)
                        for s in scorers
                        if s != "sql" and by.get(s)
                    }
                    if "sql" in scorers
                    else {}
                ),
            }
            for q, by in results.items()
        },
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["queries"], indent=1))


if __name__ == "__main__":
    main()
