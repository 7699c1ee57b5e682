#!/usr/bin/env python
"""One scaling-bench trial: run the end-to-end extraction job on the sf0.1
spans tier at local[$SPARK_GRAFT_CPUS] and print one JSON line with wall
time + docs/sec. Invoked by tools/scaling_bench.py once per parallelism
level (fresh JVM per level so executor-thread count is honest).

This is the sandbox stand-in for the north rule's N-vs-4N executor
criterion (BASELINE.json `north_rule`): same job, same input, two
parallelism levels.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docling_nlp_api_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tier = os.environ.get("SPARK_GRAFT_TIER", "sf0.1")
    # best-of-5: the sandbox is a VM with noisy-neighbor variance up to
    # ~40% between runs; best-of approximates unloaded-host capability
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "5"))

    from docling_nlp_api_spark.datagen import TIER_DOCS, ensure_spans_parquet
    from docling_nlp_api_spark.operators.extract import extract

    # split the scan so each level runs >= ~4 task waves: a 1.2-wave stage
    # leaves the last wave's stragglers idling most cores (pure measurement
    # artifact of a small input; at 100 TB there are millions of splits)
    mpb = os.environ.get("SPARK_GRAFT_MPB", "16m")
    arrow_batch = os.environ.get("SPARK_GRAFT_ARROW_BATCH", "256")
    spark = get_spark(
        f"scaling_local{cores}",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": mpb,
            "spark.sql.execution.arrow.maxRecordsPerBatch": arrow_batch,
        },
    )
    path = ensure_spans_parquet(spark, tier)
    spans = spark.read.parquet(path)
    n_docs = TIER_DOCS[tier]

    # warm-up: one FULL untimed pass (page cache, JIT, codegen, Python
    # worker pool) — a partial pass leaves cold workers and cold file
    # ranges that then dominate trial 1
    extract(spans).write.format("noop").mode("overwrite").save()

    best = float("inf")
    times = []
    for _ in range(trials):
        t0 = time.time()
        extract(spans).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        times.append(round(dt, 3))
        best = min(best, dt)

    print(
        json.dumps(
            {
                "cores": cores,
                "tier": tier,
                "docs": n_docs,
                "trials": times,
                "sec": round(best, 3),
                "docs_per_sec": round(n_docs / best, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
