#!/usr/bin/env python
"""spark-submit entrypoint for the END-TO-END corpus curation pipeline —
the "switch your training-data prep to this repo" job, composing the
already-audited operators in the order a production run executes them:

    quality gates (charset -> length -> repetition -> score, then the
    Gopher heuristic set and the C4 page gates)        [map-only funnel]
 -> near-dup dedup (exact + MinHash/LSH -> Jaccard verify -> connected
    components -> keep-set)                            [bucket equi-joins]
 -> shard write: hash(doc_id)-assigned, fixed shard count, plus a
    funnel-audit table and one metrics JSON            [one exchange]

Cluster usage (ships the package to executors via --py-files):

    python tools/make_pyfiles_zip.py          # -> dist/docling_nlp_api_spark.zip
    spark-submit \
        --master <cluster-master> \
        --py-files dist/docling_nlp_api_spark.zip \
        jobs/curation_job.py \
        --input <documents parquet/iceberg path> \
        --output <output root> --shards 4096

Sandbox smoke (local cores, synthetic tier):

    python jobs/curation_job.py --tier sf0.001 --output /tmp/curation_out

Outputs under --output:
    corpus/     parquet (doc_id, text, shard)  the curated corpus,
                repartitioned by shard so each output file IS a shard
    funnel/     parquet (doc_id, verdict, gopher_verdict, c4_verdict)
                per-doc audit of every gate decision (kept docs included)
    metrics.json  stage-by-stage funnel counts (also printed)

Scale notes: the gate stage is map-only column algebra that fuses into
the corpus scan (verdict predicates push down to the rewrite); dedup's
exchanges are the shingle->signature aggregation and the keep anti-join
(audited in jobs/dedup_job.py); the shard write is the single
corpus-wide exchange, keyed on a uniform hash so 4096 shards of a
10^12-doc corpus stay balanced regardless of doc_id clustering. Funnel
ordering is deliberate: cheap map-side gates run BEFORE dedup so the
expensive signature pass only sees docs that survive them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_curation(spark, docs, output: str, shards: int = 8,
                 threshold: float = 0.5,
                 gates: tuple[str, ...] = ("funnel", "gopher", "c4")) -> dict:
    """Compose gates -> dedup -> shard write over `docs` (doc_id, text).
    Returns the metrics dict; every count in it is re-read from the
    written tables (what landed, not what was planned).

    `gates` selects which keep-predicates apply (all audit columns are
    always WRITTEN — gate selection is corpus-dependent config, e.g. the
    Gopher thresholds target web prose and would blank a short-doc
    corpus, but the audit of why is still wanted). Valid gates: funnel,
    gopher, c4 (full C4 verdict incl. the 3-sentence page gate), c4_page
    (brace/lorem-ipsum page gates only — the right setting for
    single-line corpora, an EXPLICIT choice rather than something
    inferred from the data). Unknown names raise."""
    from pyspark.sql import functions as F

    from docling_nlp_api_spark.operators.textquality import (
        c4_line_filters,
        filter_funnel,
        gopher_quality_rules,
    )
    from jobs.dedup_job import run_dedup

    bad = set(gates) - {"funnel", "gopher", "c4", "c4_page"}
    if bad:
        raise ValueError(f"unknown gates: {sorted(bad)} "
                         "(valid: funnel, gopher, c4, c4_page)")
    if "c4" in gates and "c4_page" in gates:
        raise ValueError("pick one of c4 / c4_page, not both")

    # the gate/dedup stages each re-scan the corpus; pin it once. The
    # body runs under try/finally so a failed write or a tripped
    # invariant assert cannot leave the corpus pinned in executor
    # storage for the session lifetime (same guard as pack_job.run_pack).
    docs = docs.persist()
    try:
        n_in = docs.count()

        # --- stage 1: map-only quality gates (one audit row per input doc)
        funnel = filter_funnel(docs).select("doc_id", "verdict")
        gopher = gopher_quality_rules(docs).select(
            "doc_id", F.col("verdict").alias("gopher_verdict")
        )
        c4 = c4_line_filters(docs).select("doc_id", F.col("verdict").alias("c4_verdict"))
        audit = funnel.join(gopher, "doc_id").join(c4, "doc_id")
        audit.write.mode("overwrite").parquet(os.path.join(output, "funnel"))
        audit = spark.read.parquet(os.path.join(output, "funnel"))

        pred = F.lit(True)
        if "funnel" in gates:
            pred = pred & (F.col("verdict") == "keep")
        if "gopher" in gates:
            pred = pred & (F.col("gopher_verdict") == "keep")
        if "c4" in gates:
            pred = pred & (F.col("c4_verdict") == "keep")
        if "c4_page" in gates:
            pred = pred & ~F.col("c4_verdict").isin("brace", "lorem_ipsum")
        kept_ids = audit.filter(pred).select("doc_id")
        n_gated = kept_ids.count()  # doc_id is unique, so |gated| == |kept_ids|
        gated = docs.join(kept_ids, "doc_id")

        # --- stage 2: near-dup dedup over the gated survivors
        dd = run_dedup(spark, gated, os.path.join(output, "dedup"), threshold)
        keep_ids = spark.read.parquet(os.path.join(output, "dedup", "keep")).select("doc_id")

        # --- stage 3: shard write (the one corpus-wide exchange)
        shard = F.pmod(F.xxhash64("doc_id"), F.lit(shards)).cast("int").alias("shard")
        curated = gated.join(keep_ids, "doc_id").select("doc_id", "text", shard)
        (curated.repartition(shards, "shard")
            .write.mode("overwrite").parquet(os.path.join(output, "corpus")))

        n_out = spark.read.parquet(os.path.join(output, "corpus")).count()
        metrics = {
            "n_docs_in": n_in,
            "n_after_gates": n_gated,
            "n_dropped_gates": n_in - n_gated,
            "n_dropped_neardup": dd["n_dropped_neardup"],
            "n_dropped_dedup_total": dd["n_dropped_total"],
            "n_docs_out": n_out,
            "shards": shards,
            "threshold": threshold,
            "gates": list(gates),
        }
        assert metrics["n_docs_out"] == n_gated - dd["n_dropped_total"], metrics
        from docling_nlp_api_spark.session import write_text_file

        # through the Hadoop FS so an hdfs://s3a:// --output root works
        write_text_file(spark, os.path.join(output, "metrics.json"), json.dumps(metrics))
    finally:
        docs.unpersist()
    return metrics


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="documents table path (parquet dir with doc_id, text)")
    p.add_argument("--tier", help="synthetic tier instead of --input (e.g. sf0.001)")
    p.add_argument("--output", required=True, help="output root (corpus/funnel/dedup/metrics)")
    p.add_argument("--shards", type=int, default=8, help="output shard count")
    p.add_argument("--threshold", type=float, default=0.5, help="Jaccard verify threshold")
    p.add_argument("--gates", default="funnel,gopher,c4",
                   help="comma-set of keep-gates: funnel,gopher,c4|c4_page")
    p.add_argument("--cores", type=int, default=None, help="local[N] cores (sandbox only)")
    args = p.parse_args(argv)
    if not args.input and not args.tier:
        p.error("one of --input / --tier is required")

    from docling_nlp_api_spark.session import get_spark

    spark = get_spark("curation_job", cores=args.cores)
    if args.input:
        docs = spark.read.parquet(args.input).select("doc_id", "text")
    else:
        tier_dir = os.environ.get("SPARK_GRAFT_DATA_ROOT", "/root/testdata")
        docs = spark.read.parquet(
            os.path.join(tier_dir, args.tier, "documents.parquet")
        ).select("doc_id", "text")
    metrics = run_curation(spark, docs, args.output, args.shards, args.threshold,
                           tuple(g for g in args.gates.split(",") if g))
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
