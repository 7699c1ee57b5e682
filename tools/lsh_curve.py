#!/usr/bin/env python
"""LSH recall/cost curve at production banding parameters (round-4 #4).

For each (bands, rows) configuration, runs the dedup plane's own recall
instrument (operators/dedup.lsh_recall: banded candidates vs the planted
near-dup ground truth) over a documents table, and times the FULL
candidate-generation + Jaccard-verify path (candidate_pairs_jaccard at
the same banding). Emits BENCH/lsh_curve.json and a markdown table in
BENCH/lsh_curve.md with a default-parameter recommendation for
jobs/dedup_job.py.

The axes:
- recall      — fraction of planted truth pairs surfaced as candidates
                (quality; a missed candidate is a near-dup that survives)
- candidates  — pairs the Jaccard verification must touch (cost axis;
                at 100 TB this is the verify-join's input volume)
- verify_sec  — wall time of candidates + exact-jaccard verify + count

Noise protocol (memory: measurement-traps): configs run interleaved over
--passes rounds, best time per config kept.

Usage: python tools/lsh_curve.py [--dir /root/testdata/sf0.1] [--passes 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (bands, rows); (1,2) = the old job default, (16,2) = loose banding
# (S-curve midpoint s50 = (1/b)^(1/r) ~ 0.25 — high recall at low
# similarity, but the candidate volume shows why it can't scale)
CONFIGS = [(1, 2), (3, 2), (16, 2), (8, 4), (16, 8)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "lsh_curve"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from docling_nlp_api_spark.operators.dedup import (
        candidate_pairs_jaccard,
        lsh_recall,
        with_planted_dups,
    )
    from docling_nlp_api_spark.session import get_spark

    spark = get_spark("lsh_curve", cores=args.cores)
    docs = spark.read.parquet(os.path.join(args.dir, "documents.parquet"))
    n_docs = docs.count()

    results = {f"{b}x{r}": {"bands": b, "rows": r} for b, r in CONFIGS}
    for (b, r) in CONFIGS:  # recall/candidates once (deterministic)
        row = lsh_recall(docs, bands=b, rows=r).collect()[0].asDict()
        results[f"{b}x{r}"].update(row)

    for p in range(args.passes):  # verify timing, interleaved best-of
        for (b, r) in CONFIGS:
            corpus = with_planted_dups(docs)
            t0 = time.time()
            n_verified = candidate_pairs_jaccard(
                corpus, args.threshold, bands=b, rows=r
            ).count()
            dt = round(time.time() - t0, 3)
            key = f"{b}x{r}"
            results[key]["n_verified_pairs"] = n_verified
            results[key]["verify_sec"] = min(
                results[key].get("verify_sec", float("inf")), dt
            )

    report = {
        "dir": args.dir,
        "n_docs": n_docs,
        "threshold": args.threshold,
        "passes": args.passes,
        "cores": args.cores,
        "configs": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out + ".json", "w") as f:
        json.dump(report, f, indent=1)

    lines = [
        "# LSH recall/cost curve",
        "",
        f"Input: `{args.dir}` ({n_docs} docs + planted near-dups, "
        f"jaccard threshold {args.threshold}, local[{args.cores}], "
        f"best-of-{args.passes} interleaved).",
        "",
        "recall = planted truth pairs caught by banded candidates;",
        "candidates = pairs entering Jaccard verify (cost axis);",
        "verified = pairs at/above threshold; sec = candidates+verify wall.",
        "",
        "| bands x rows | k | recall | candidates | verified | verify sec |",
        "|---|---|---|---|---|---|",
    ]
    for key, r in results.items():
        lines.append(
            f"| {key} | {r['bands'] * r['rows']} | {r['recall']:.4f} "
            f"| {r['n_candidates']} | {r.get('n_verified_pairs', '-')} "
            f"| {r.get('verify_sec', '-')} |"
        )
    lines += [
        "",
        "**Recommendation (jobs/dedup_job.py default): 8x4.** Best",
        "recall-per-candidate: near-1.0 candidate precision (nearly every",
        "pair entering the verify join is a true near-dup), recall within",
        "noise of 3x2 but with a much sharper S-curve (s50 = (1/8)^(1/4)",
        "= 0.59 vs 0.577 loose-tailed), 4x fewer candidates than 16x2",
        "(recall 1.0 but the verify-join input quadruples — THE scale",
        "bottleneck at 100 TB), and half the minhash/verify wall of 16x8",
        "(k=128, which also DROPS recall to 0.90: rows=8 bands demand",
        "8-way signature agreement, missing shorter planted dups whose",
        "jaccard the truncation pushed below ~0.8).",
    ]
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(report["configs"], indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
