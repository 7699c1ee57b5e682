#!/usr/bin/env python
"""A/B: embedding near-dup pair-LIST contract vs the fused star-kernel
CLUSTERS contract at the 100x tier (.data/star_sf10, 200k vectors,
label-clustered so the pair volume is quadratic in cluster size).

The sf10 dry run (BENCH/sf10.json, BENCH/ann_ab_sf10_kernel.json) showed
dedup_embedding_cosine is OUTPUT-bound: 191.6M distinct pairs at
threshold 0.40, scoring <1 s. embedding_dup_clusters fuses resolution
into the kernel (vecmath.gram_star_kernel): per-bucket local CC emits
O(group) star edges + the ~0-measure boundary sliver, so the quadratic
pair set never leaves the kernel, and global CC runs on a linear-size
edge set. This tool measures both contracts interleaved (best-of-N, the
repo's noisy-VM protocol) and records edge/pair/output volumes.

Usage: python tools/neardup_fused_bench.py [--sf-dir .data/star_sf10]
       [--trials 2] [--out BENCH/neardup_fused.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docling_nlp_api_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".data/star_sf10")
    def positive_int(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("--trials must be >= 1")
        return n

    ap.add_argument("--trials", type=positive_int, default=2)
    ap.add_argument("--out", default="BENCH/neardup_fused.json")
    args = ap.parse_args()

    from docling_nlp_api_spark.operators.dedup import (
        embedding_dup_clusters,
        embedding_near_dup,
    )

    spark = get_spark("neardup_fused_bench")

    def run(df) -> int:
        return df.count()

    best = {"pairs_list": float("inf"), "fused_clusters": float("inf")}
    counts: dict[str, int] = {}
    for t in range(args.trials):
        for name, fn in (
            ("fused_clusters", lambda: embedding_dup_clusters(spark, args.sf_dir, audit=True)),
            ("pairs_list", lambda: embedding_near_dup(spark, args.sf_dir, audit=True)),
        ):
            t0 = time.time()
            counts[name] = run(fn())
            sec = round(time.time() - t0, 2)
            best[name] = min(best[name], sec)
            print(f"trial {t}: {name} = {sec} s ({counts[name]} rows)", flush=True)

    out = {
        "sf_dir": args.sf_dir,
        "trials": args.trials,
        "best_sec": best,
        "rows": counts,
        "speedup": round(best["pairs_list"] / best["fused_clusters"], 2),
        "note": "pair-list contract materializes the distinct verified pair set "
        "(quadratic in cluster sizes); fused contract star-contracts definite "
        "pairs in-kernel and returns one (vec_id, canonical_id, is_canonical) "
        "row per clustered vector (linear).",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
