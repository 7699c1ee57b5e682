#!/usr/bin/env python
"""spark-submit entrypoint for CONTINUOUS extraction ingestion
(streaming/extract.py) — the steady-state tail to extract_job.py's
checkpointed backfill.

Cluster usage:

    spark-submit \
        --master <cluster-master> \
        --py-files dist/docling_nlp_api_spark.zip \
        jobs/extract_stream_job.py \
        --source <spans drop-zone path> \
        --output <sink path> \
        --checkpoint <checkpoint dir>

Each invocation drains everything the checkpoint has not committed
(Trigger.AvailableNow) and exits — run it from a scheduler for
micro-batch cadence, or swap the trigger for a long-running service. A
restart never reprocesses a committed file (exactly-once from the
engine's offsets/commits WAL; evidenced by
tests/test_streaming.py::test_extract_stream_matches_batch_and_resumes).

Sandbox smoke (stages its own synthetic drop zone):

    python jobs/extract_stream_job.py --demo /tmp/stream_demo
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", help="spans drop-zone directory (parquet files)")
    p.add_argument("--output", help="extracted sink path")
    p.add_argument("--checkpoint", help="streaming checkpoint dir")
    p.add_argument("--demo", help="run a self-staged demo under this directory")
    p.add_argument("--demo-docs", type=int, default=300)
    p.add_argument("--cores", type=int, default=None, help="local[N] cores (sandbox only)")
    args = p.parse_args(argv)

    from docling_nlp_api_spark.session import get_spark
    from docling_nlp_api_spark.streaming import run_extract_stream, stage_span_chunks

    spark = get_spark("extract-stream-job", cores=args.cores)
    if args.demo:
        src = os.path.join(args.demo, "drop")
        out = os.path.join(args.demo, "out")
        ck = os.path.join(args.demo, "ck")
        stage_span_chunks(spark, src, n_docs=args.demo_docs, n_chunks=3)
    else:
        if not (args.source and args.output and args.checkpoint):
            p.error("--source/--output/--checkpoint are required without --demo")
        src, out, ck = args.source, args.output, args.checkpoint

    n_batches = run_extract_stream(spark, src, out, ck)
    # existence via the Hadoop FS, not os.path: --output may be
    # hdfs://s3a://, where an isdir gate is always False and would report
    # sink_rows=0 after a successful run. The one legitimate zero is a
    # never-created sink (no input files); a CORRUPT or unreadable sink
    # must raise, not masquerade as empty.
    from docling_nlp_api_spark.session import fs_exists

    n_rows = spark.read.parquet(out).count() if fs_exists(spark, out) else 0
    print(json.dumps({"data_batches": n_batches, "sink_rows": n_rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
