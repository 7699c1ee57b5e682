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

    # batch ceiling on the SAME files, same JVM (warm it once first)
    extract(spark.read.parquet(drop)).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    extract(spark.read.parquet(drop)).write.format("noop").mode("overwrite").save()
    batch_sec = round(time.time() - t0, 3)

    results = {"batch_kernel_same_files": {"sec": batch_sec, "micro_batches": None,
                                           "docs_per_sec": round(n_docs / batch_sec)}}
    for label, mfpt in [("stream_one_batch", None), ("stream_mfpt8", 8)]:
        out_dir = os.path.join(args.scratch, f"out_{label}")
        ckpt = os.path.join(args.scratch, f"ckpt_{label}")
        t0 = time.time()
        n_batches = run_extract_stream(spark, drop, out_dir, ckpt,
                                       max_files_per_trigger=mfpt)
        sec = round(time.time() - t0, 3)
        got = spark.read.parquet(out_dir).count()
        assert got == n_docs, f"{label}: sink has {got} docs, expected {n_docs}"
        results[label] = {"sec": sec, "micro_batches": n_batches,
                          "docs_per_sec": round(n_docs / sec)}
        print(f"{label}: {sec}s, {n_batches} micro-batches, "
              f"{results[label]['docs_per_sec']} docs/s", flush=True)

    report = {"tier": args.tier, "n_docs": n_docs, "n_files": len(parts),
              "cores": args.cores, "results": results}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    shutil.rmtree(args.scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
