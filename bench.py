#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "extraction": {docs, spans, sec, docs_per_sec}, "cores": N}

The extraction number is the north-star metric (docs/sec end-to-end over
the interleaved spans table, FIXTURES.md tier sf0.1 = 50k docs incl. ~50
mega-docs). Datagen is cached to .data/ and excluded from timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from docling_nlp_api_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q5_revenue_by_nation",
    "t4_sliding_window_rate",
    "j_broadcast_part_stats",
    "a1_daily_rollup",
    "a11_multi_window",
    "j1_dense_date_trend",
    "w1_top_event_types",
    "a8_corpus_keywords",
    "tq_quality_score",
    "tq_fingerprint",
    "dedup_minhash_signatures",
    "dedup_lsh_buckets",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "ann_lsh_buckets",
]


def tier_of(path: str) -> str:
    """Tier basename of the bench dir — must be a datagen.TIER_DOCS tier.
    A silent sf0.1 fallback here once risked a mixed-tier benchmark
    (extraction measured at sf0.1 while catalog queries ran elsewhere,
    labeled as if one tier) — unknown tiers now fail fast instead."""
    from docling_nlp_api_spark.datagen import TIER_DOCS

    name = path.rstrip("/").rsplit("/", 1)[-1]
    if name not in TIER_DOCS:
        raise SystemExit(
            f"bench.py: SPARK_GRAFT_SF_DIR basename {name!r} is not a known "
            f"tier ({sorted(TIER_DOCS)})"
        )
    return name


def sf_of(path: str) -> float:
    return float(tier_of(path)[2:])


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    from docling_nlp_api_spark.catalog import QUERIES
    from docling_nlp_api_spark.datagen import TIER_DOCS, ensure_spans_parquet
    from docling_nlp_api_spark.operators.extract import extract

    spark = get_spark("bench", cores=CORES, shuffle_partitions=CORES)

    # --- extraction (north star): cached spans parquet -> extract -> noop sink
    tier = tier_of(SF_DIR)
    n_docs = TIER_DOCS.get(tier, 50000)
    spans_path = ensure_spans_parquet(spark, tier)
    spans = spark.read.parquet(spans_path)
    n_spans = spans.selectExpr("sum(size(spans)) s").collect()[0]["s"]

    # untimed warm-up (JIT, codegen, Python worker pool, page cache) so the
    # recorded number reflects steady-state capability, not JVM cold start
    run_noop(extract(spans))

    # --- best-of-N, everything interleaved across rounds: the sandbox VM
    # has noisy-neighbor windows that inflate timings up to 25x and can
    # span many consecutive seconds — consecutive trials of one query all
    # land in the same window, so each round runs one extraction trial
    # plus every catalog query, and the best per item wins
    ex_sec = _timed(lambda: run_noop(extract(spans)))
    qtimes = {name: float("inf") for name in BENCH_QUERIES}
    errors: dict[str, str] = {}
    for _ in range(3):
        for name in BENCH_QUERIES:
            try:
                # lookup inside the try: a renamed catalog entry must cost
                # one failed query in the JSON, not a KeyError that loses
                # the whole bench line
                fn = QUERIES[name]
                qtimes[name] = round(
                    min(qtimes[name], _timed(lambda: run_noop(fn(spark, SF_DIR)))), 3
                )
                errors.pop(name, None)  # an earlier-round flake that now passed
            except Exception as exc:  # one broken query must not lose the JSON line
                errors[name] = str(exc).splitlines()[0][:200]
        ex_sec = min(ex_sec, _timed(lambda: run_noop(extract(spans))))
    # extraction is the north-star number and single trials on this host
    # range 1.87-21.5 s (BENCH/BASELINE.md noisy-neighbor evidence), so
    # give it a short dedicated tail of extra spaced trials on top of the
    # interleaved rounds — 7 total timed trials — to keep the recorded
    # value near the capability floor rather than a noise window
    for _ in range(3):
        ex_sec = min(ex_sec, _timed(lambda: run_noop(extract(spans))))
    # a query that failed every round stays in the JSON as null (and is
    # counted in failed_queries) so totals across runs are never compared
    # with silently different denominators
    failed = [n for n, t in qtimes.items() if t == float("inf")]
    for name in failed:
        qtimes[name] = None
    qtimes["extract_spans"] = round(ex_sec, 3)

    total = round(sum(t for t in qtimes.values() if t is not None), 3)
    print(
        json.dumps(
            {
                "metric": "total_headline_sec",
                "value": total,
                "unit": "sec",
                "queries": qtimes,
                "failed_queries": len(failed),
                **({"query_errors": errors} if errors else {}),
                "sf": sf_of(SF_DIR),
                "cores": CORES,
                "extraction": {
                    "docs": n_docs,
                    "spans": int(n_spans),
                    "sec": round(ex_sec, 3),
                    "docs_per_sec": round(n_docs / ex_sec, 1),
                    "spans_per_sec": round(int(n_spans) / ex_sec, 1),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
