#!/usr/bin/env python
"""Salted-vs-unsalted skew-join WALL-TIME experiment (round-4 evidence #6).

`j_salted_skew_join` (operators/relational.py:162) already proves the
salted rollup is value-identical to the unsalted join (the DuckDB oracle
IS the unsalted SQL) and that the plan shuffles on
hashpartitioning(event_type, salt). What it does NOT prove is that the
salt buys actual reducer balance — at sf0.1 the fact table is uniform
over 5 event types, which never stresses a reducer.

This runs both join shapes on the deliberately skewed tier
(.data/star_sf10/events_skew: 10M rows, 90% event_type='view', built by
tools/make_star_tier.py) with AQE skew-split DISABLED, so the unsalted
join's hot key lands on ONE reducer while the salted join spreads it
over k=16. AQE skew handling is turned off precisely because it is the
runtime alternative to manual salting — leaving it on would let Spark
split the hot partition itself and mask the effect being measured.

Noise protocol (BENCH/regress_ab.json discipline): variants interleave
A/B/A/B within one JVM and the best-of per variant is reported, plus all
trials raw. A correctness cross-check asserts both shapes return
identical rows before any timing is trusted.

Usage: python tools/skew_bench.py [--dir .data/star_sf10] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(REPO, ".data", "star_sf10"))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "skew_join.json"))
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from docling_nlp_api_spark.operators.relational import (
        EVENT_DIM_WEIGHTS,
        SKEW_SALT_K,
        salted_skew_join_rollup,
    )
    from docling_nlp_api_spark.session import get_spark

    spark = get_spark(
        "skew_bench",
        cores=args.cores,
        shuffle_partitions=max(args.cores, 64),
        extra_conf={"spark.sql.adaptive.skewJoin.enabled": "false"},
    )
    events = spark.read.parquet(os.path.join(args.dir, "events_skew.parquet"))

    def unsalted(ev: DataFrame) -> DataFrame:
        # identical semantics, no salt: ONE reducer key carries 90% of rows
        dim = spark.createDataFrame(
            sorted(EVENT_DIM_WEIGHTS.items()), "event_type string, weight double"
        )
        j = ev.select("event_type", "value").join(dim.hint("merge"), ["event_type"])
        return j.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value") * F.col("weight")), 4).alias("weighted_value"),
        )

    variants = {
        "unsalted": lambda: unsalted(events),
        f"salted_k{SKEW_SALT_K}": lambda: salted_skew_join_rollup(events),
    }

    # correctness gate first: both shapes must agree row-for-row
    rows = {
        name: sorted(map(tuple, fn().collect())) for name, fn in variants.items()
    }
    vals = list(rows.values())
    assert vals[0] == vals[1], f"salted != unsalted: {vals[0][:2]} vs {vals[1][:2]}"
    skew_share = (
        events.groupBy("event_type").count().orderBy(F.desc("count")).first()
    )
    print(f"correctness OK; hottest key {skew_share[0]} = {skew_share[1]} rows")

    trials: dict[str, list[float]] = {n: [] for n in variants}
    for t in range(args.trials):
        for name, fn in variants.items():  # interleaved A/B
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            trials[name].append(dt)
            print(f"[trial {t + 1}] {name}: {dt}s", flush=True)

    best = {n: min(v) for n, v in trials.items()}
    report = {
        "dir": args.dir,
        "cores": args.cores,
        "aqe_skew_join": False,
        "salt_k": SKEW_SALT_K,
        "hot_key": skew_share[0],
        "hot_key_rows": skew_share[1],
        "total_rows": events.count(),
        "best_sec": best,
        "speedup_salted_vs_unsalted": round(
            best["unsalted"] / best[f"salted_k{SKEW_SALT_K}"], 2
        ),
        "trials": trials,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
