#!/usr/bin/env python
"""Streaming-plane throughput bench (round-4 evidence #8).

t3/t4/t6/t7 pin streaming CORRECTNESS; the only throughput number so far
was a toy 60-doc checkpoint-cycle run (~15 docs/s, fixed engine overhead
dominated). This measures the real thing: one availableNow drain of the
sf0.1-scale spans drop zone (50k docs, the same fixture corpus the batch
kernel's 19.2k docs/s headline uses) through streaming/extract.py, at
two micro-batch granularities, plus the batch kernel on the SAME staged
files in the SAME JVM as the apples-to-apples ceiling.

Expected shape: with maxFilesPerTrigger=None the drain is ONE micro-batch
running the identical mapInArrow kernel, so docs/s should approach the
batch number minus one commit-log round; small maxFilesPerTrigger buys
commit granularity (restart loses at most that many files of work) at a
per-batch fixed cost — the bench quantifies that trade so a deployment
can pick a trigger size from data instead of folklore.

Round-5 accounting fix: the round-4 run charged the stream for parquet
encoding AND an in-window verification count() that the noop batch
ceiling never paid, reporting 2.26x as "engine overhead". Now the
verification read is untimed, and a batch_parquet_same_files variant
(identical kernel, identical sink format) isolates the streaming
engine's true cost as vs_batch_parquet.

Usage: python tools/stream_bench.py [--out BENCH/stream_bench.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "stream_bench.json"))
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--scratch", default=os.path.join(REPO, ".data", "stream_bench"))
    args = ap.parse_args()

    from docling_nlp_api_spark.datagen import TIER_DOCS, ensure_spans_parquet
    from docling_nlp_api_spark.operators.extract import extract
    from docling_nlp_api_spark.session import get_spark
    from docling_nlp_api_spark.streaming.extract import run_extract_stream

    n_docs = TIER_DOCS[args.tier]
    spark = get_spark("stream_bench", cores=args.cores)

    # stage the drop zone: the materialized tier's own part files, copied
    # flat (file-source streams must not partition-infer)
    src = ensure_spans_parquet(spark, args.tier)
    drop = os.path.join(args.scratch, "drop")
    shutil.rmtree(args.scratch, ignore_errors=True)
    os.makedirs(drop)
    parts = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
    for i, p in enumerate(parts):
        shutil.copy(p, os.path.join(drop, f"docs_{i:05d}.parquet"))
    print(f"staged {len(parts)} files / {n_docs} docs into {drop}", flush=True)

    # Noise protocol (BENCH/BASELINE.md "Measurement honesty": this host
    # has multi-minute noisy-neighbor windows where the same kernel runs
    # 2-10x slower). Variants interleave batch/stream1/stream8 per round
    # and best-of is reported, so every variant samples the same windows;
    # the batch kernel measured in the SAME session is the ceiling the
    # streaming numbers are ratioed against.
    def run_batch() -> int:
        extract(spark.read.parquet(drop)).write.format("noop").mode("overwrite").save()
        return -1

    seq = [0]

    def run_batch_parquet() -> int:
        # SAME sink work as the stream variants (full extraction output
        # written as parquet) minus the streaming engine — this, not the
        # noop ceiling, is the apples-to-apples base for "what does
        # Structured Streaming itself cost": the round-4 2.26x number
        # charged the stream for parquet encoding + an in-window
        # verification read that the noop batch never paid
        out_dir = os.path.join(args.scratch, f"bout_{seq[0]}")
        seq[0] += 1
        extract(spark.read.parquet(drop)).write.mode("overwrite").parquet(out_dir)
        return -1

    def run_stream(mfpt):
        def go() -> int:
            out_dir = os.path.join(args.scratch, f"out_{seq[0]}")
            ckpt = os.path.join(args.scratch, f"ckpt_{seq[0]}")
            seq[0] += 1
            n_batches = run_extract_stream(spark, drop, out_dir, ckpt,
                                           max_files_per_trigger=mfpt)
            # verification is OUTSIDE the caller's timed window (see
            # verify_dirs) — the timed region is the drain alone
            verify_dirs.append(out_dir)
            return n_batches
        return go

    verify_dirs: list[str] = []
    variants = {"batch_kernel_same_files": run_batch,
                "batch_parquet_same_files": run_batch_parquet,
                "stream_one_batch": run_stream(None),
                "stream_mfpt8": run_stream(8)}
    run_batch()  # JVM/codegen warmup
    results = {n: {"sec": None, "micro_batches": None} for n in variants}
    for rnd in range(args.rounds):
        for label, fn in variants.items():
            t0 = time.time()
            nb = fn()
            sec = round(time.time() - t0, 3)
            prev = results[label]["sec"]
            if prev is None or sec < prev:
                results[label] = {"sec": sec,
                                  "micro_batches": nb if nb >= 0 else None}
            print(f"[round {rnd + 1}] {label}: {sec}s", flush=True)
        # untimed: exactly-once verification of every streaming sink
        # written this round
        while verify_dirs:
            d = verify_dirs.pop()
            got = spark.read.parquet(d).count()
            assert got == n_docs, f"sink {d} has {got} docs, expected {n_docs}"
    for label, r in results.items():
        r["docs_per_sec"] = round(n_docs / r["sec"])
    base = results["batch_kernel_same_files"]["sec"]
    for label, r in results.items():
        r["vs_batch"] = round(r["sec"] / base, 2)
    pq = results["batch_parquet_same_files"]["sec"]
    for label in ("stream_one_batch", "stream_mfpt8"):
        # the streaming ENGINE's own cost: same kernel, same parquet sink
        results[label]["vs_batch_parquet"] = round(results[label]["sec"] / pq, 2)

    report = {"tier": args.tier, "n_docs": n_docs, "n_files": len(parts),
              "cores": args.cores, "rounds": args.rounds, "results": results}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    shutil.rmtree(args.scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
