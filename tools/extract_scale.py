#!/usr/bin/env python
"""100x extraction-throughput run (round-4 scale evidence, north rule).

The headline metric is docs/sec end-to-end extraction at sf0.1 (50k docs,
4.2M spans, 19.2k docs/s in BENCH_r03). This runs the IDENTICAL
bench.py methodology (cached spans parquet -> extract -> noop sink,
datagen excluded from timing) at a 50-100x tier (sf5 = 2.5M docs /
sf10 = 5M docs, same mega-doc plant every 997th doc so the skew tail
scales too: ~5k mega-docs at sf10). Purpose: prove docs/s HOLDS at 100x
— i.e. the kernel is memory-bounded per Arrow batch (extract_arrow
re-cuts batches over BATCH_SPAN_BUDGET) and has no hidden
corpus-proportional driver state. A flat docs/s line from 50k to 5M docs
plus the sf0.5 two-parallelism scaling efficiency (BENCH/scaling.json)
is the sandbox-expressible form of the 10^12-doc claim.

Usage: python tools/extract_scale.py [--tier sf10] [--trials 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="sf10")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(REPO, "BENCH", f"extract_{args.tier}.json")

    from docling_nlp_api_spark.datagen import TIER_DOCS, ensure_spans_parquet
    from docling_nlp_api_spark.operators.extract import extract
    from docling_nlp_api_spark.session import get_spark

    n_docs = TIER_DOCS[args.tier]
    spark = get_spark("extract_scale", cores=args.cores)

    t0 = time.time()
    path = ensure_spans_parquet(spark, args.tier)
    gen_sec = round(time.time() - t0, 1)
    spans = spark.read.parquet(path)
    n_spans = spans.select("doc_id", "spans").selectExpr(
        "sum(size(spans)) as n").first()["n"]
    print(f"tier {args.tier}: {n_docs} docs, {n_spans} spans, "
          f"gen/cache {gen_sec}s", flush=True)

    trials = []
    for t in range(args.trials):
        t0 = time.time()
        extract(spans).write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 3)
        trials.append(sec)
        print(f"[trial {t + 1}] {sec}s = {round(n_docs / sec)} docs/s, "
              f"{round(n_spans / sec)} spans/s", flush=True)

    best = min(trials)
    report = {
        "tier": args.tier,
        "cores": args.cores,
        "n_docs": n_docs,
        "n_spans": int(n_spans),
        "gen_cache_sec": gen_sec,
        "trials_sec": trials,
        "best_sec": best,
        "docs_per_sec": round(n_docs / best),
        "spans_per_sec": round(n_spans / best),
    }
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
