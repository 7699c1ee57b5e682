#!/usr/bin/env python
"""State-operator scale probe (round-5 evidence #7).

t5's applyInPandasWithState operator (streaming/events.user_totals_stream)
is the slowest sf10 catalog entry — per-GROUP Python is the only custom
stateful mechanism PySpark offers, so its cost model in the number of
distinct keys decides whether the operator survives a 100x key blow-up.
This probe measures one availableNow drain of a synthetic event drop zone
at increasing key cardinality, same total event count, under BOTH state
store providers (HDFS-backed in-memory vs RocksDB), and reports the
per-key cost curve.

What linear means here: doubling keys at fixed event volume adds one
state-store get/put and one pandas-group invocation per extra key, so
wall time should grow ~affine in keys (a + b*K). Superlinear growth
would flag a per-key cost that compounds (state rescans, sort blowup) —
the thing a 1000-executor deployment cannot absorb.

Usage: python tools/state_scale_probe.py [--out BENCH/state_scale.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def stage_synthetic_events(spark, drop: str, n_events: int, n_keys: int, n_files: int = 8):
    """Deterministic synthetic event chunks: n_events rows over n_keys
    users, event-time ascending across the staged files so the watermark
    advances between micro-batches exactly as a live feed would."""
    from pyspark.sql import functions as F

    os.makedirs(drop, exist_ok=True)
    per = (n_events + n_files - 1) // n_files
    for k in range(n_files):
        lo, hi = k * per, min((k + 1) * per, n_events)
        if lo >= hi:
            break
        df = (
            spark.range(lo, hi)
            .select(
                F.col("id").alias("event_id"),
                (
                    F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                    + F.make_interval(secs=(F.col("id") / 100.0))
                ).alias("ts"),
                (F.col("id") % n_keys).alias("user_id"),
                F.concat(F.lit("type_"), (F.col("id") % 7).cast("string")).alias(
                    "event_type"
                ),
                (F.col("id") % 100).cast("double").alias("value"),
                F.lit("{}").alias("props"),
            )
        )
        tmp = os.path.join(drop, "_stage_tmp")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        import glob

        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(part, os.path.join(drop, f"chunk_{k:03d}.parquet"))
        shutil.rmtree(tmp)


def run_one(provider: str, n_events: int, n_keys: int, scratch: str, cores: int) -> dict:
    """Fresh session per (provider, cardinality) cell: the state store
    provider is a session-build config, and a cold JVM per cell keeps the
    cells comparable (one untimed warm-up drain absorbs JIT/codegen)."""
    os.environ["SPARK_GRAFT_STATE_STORE"] = provider if provider == "rocksdb" else ""
    from docling_nlp_api_spark.session import get_spark
    from docling_nlp_api_spark.streaming.events import (
        read_event_stream,
        run_available_now,
        user_totals_stream,
    )

    spark = get_spark(f"state_probe_{provider}_{n_keys}", cores=cores)
    try:
        drop = os.path.join(scratch, f"drop_{n_keys}")
        if not os.path.isdir(drop):
            stage_synthetic_events(spark, drop, n_events, n_keys)

        def drain() -> int:
            ck = os.path.join(scratch, f"ck_{provider}_{n_keys}_{time.time_ns()}")
            out = run_available_now(
                user_totals_stream(
                    read_event_stream(spark, drop, max_files_per_trigger=None)
                ),
                output_mode="update",
                checkpoint_dir=ck,
            )
            n = out.count()
            shutil.rmtree(ck, ignore_errors=True)
            return n

        drain()  # untimed warm-up (JIT, Python worker pool, page cache)
        t0 = time.time()
        n_out = drain()
        sec = time.time() - t0
        assert n_out >= n_keys, f"{n_out} output rows for {n_keys} keys"
        return {
            "provider": provider,
            "n_events": n_events,
            "n_keys": n_keys,
            "sec": round(sec, 3),
            "us_per_key": round(sec / n_keys * 1e6, 2),
            "events_per_sec": round(n_events / sec),
        }
    finally:
        spark.stop()
        os.environ.pop("SPARK_GRAFT_STATE_STORE", None)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "state_scale.json"))
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--keys", type=int, nargs="+", default=[10_000, 100_000])
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--scratch", default=os.path.join(REPO, ".data", "state_probe"))
    args = ap.parse_args()

    shutil.rmtree(args.scratch, ignore_errors=True)
    rows = []
    for provider in ("hdfs", "rocksdb"):
        for n_keys in args.keys:
            row = run_one(provider, args.events, n_keys, args.scratch, args.cores)
            rows.append(row)
            print(json.dumps(row), flush=True)

    # linearity verdict per provider: cost ratio vs key ratio
    summary = {}
    for provider in ("hdfs", "rocksdb"):
        cells = sorted(
            (r for r in rows if r["provider"] == provider), key=lambda r: r["n_keys"]
        )
        if len(cells) >= 2:
            key_ratio = cells[-1]["n_keys"] / cells[0]["n_keys"]
            sec_ratio = cells[-1]["sec"] / cells[0]["sec"]
            summary[provider] = {
                "key_ratio": key_ratio,
                "sec_ratio": round(sec_ratio, 2),
                # affine a + b*K growth keeps sec_ratio <= key_ratio;
                # anything materially above key_ratio is superlinear
                "linear_or_better": sec_ratio <= key_ratio * 1.15,
            }
    report = {"cores": args.cores, "cells": rows, "summary": summary}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    shutil.rmtree(args.scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
