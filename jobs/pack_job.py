#!/usr/bin/env python
"""spark-submit entrypoint for the TRAINING-BATCH EXPORT stage — the step
after curation/dedup that turns a curated (doc_id, text) corpus into the
fixed-length, sharded sequence streams a trainer consumes:

    stable train/val/test split (md5 bucket — corpus growth never moves
    an existing doc between splits)                     [map-only]
 -> per-(split, shard) concat-and-chunk packing: cumsum window inside
    each md5 shard, docs may straddle sequence boundaries but NEVER a
    split boundary (each split packs its own disjoint streams — packing
    across splits would leak val/test tokens into train batches)
                                                [one window per stream]
 -> doc_map write partitioned by (split, shard): each output file IS an
    independent training stream; a reader materializes sequence k of a
    shard from the rows with seq_idx <= k AND
    start_off + n_tokens > k*max_tokens (each doc has ONE placement row
    at its starting sequence; a doc longer than max_tokens spills across
    every sequence up to that bound)            [one keyed exchange]

Cluster usage (ships the package to executors via --py-files):

    python tools/make_pyfiles_zip.py      # -> dist/docling_nlp_api_spark.zip
    spark-submit \
        --master <cluster-master> \
        --py-files dist/docling_nlp_api_spark.zip \
        jobs/pack_job.py \
        --input <curated corpus parquet> --output <output root> \
        --max-tokens 2048 --shards 4096

Sandbox smoke (local cores, synthetic tier):

    python jobs/pack_job.py --tier sf0.001 --output /tmp/pack_out

Outputs under --output:
    doc_map/     parquet (doc_id, split, shard, n_tokens, start_off,
                 seq_idx, seq_off) — every doc's exact placement,
                 repartitioned by (split, shard)
    streams/     parquet (split, shard, n_docs, n_tokens, n_seqs,
                 tail_tokens) — per-stream accounting
    sequences/   (--materialize only) parquet (split, shard, seq_idx,
                 tokens, doc_starts) — the packed token content itself,
                 reconciled stream-by-stream against streams/
    metrics.json per-split totals + the reconciliation verdicts

Exact token accounting (asserted in-job, re-read from the LANDED
tables — what landed, not what was planned):
    1. placement: every input doc appears in doc_map exactly once, and
       sum(doc_map.n_tokens) == the input corpus's own token mass
       (recomputed independently from text) — packing drops nothing.
    2. stream arithmetic, per (split, shard): n_seqs == ceil(total /
       max_tokens), tail == total % max_tokens, and max(seq_idx) ==
       (total - 1) DIV max_tokens — the cumsum, the chunk math, and the
       landed rows agree to the last token.
    3. determinism: a re-run writes a byte-identical doc_map (md5
       buckets + integer arithmetic only — no timestamps, no RNG), so
       the job is idempotent and a crashed export can simply be re-run.

Scale notes: the split and token count are map-side column algebra; the
only exchange is hashpartitioning(split, shard) feeding per-stream
cumsum windows whose state is bounded by corpus/n_shards (raise --shards
so a stream fits an executor; 4096 streams of a 10^12-doc corpus stay
balanced because the shard is a uniform md5 bucket, not a data key).
Nothing corpus-sized reaches the driver: metrics aggregate per-stream
rows (splits x shards of them)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_pack(
    spark,
    docs,
    output: str,
    max_tokens: int = 512,
    shards: int = 8,
    materialize: bool = False,
) -> dict:
    """Compose split -> per-stream packing -> partitioned write over
    `docs` (doc_id, text). Returns the metrics dict; every count in it is
    re-read from the written tables.

    materialize=True additionally writes sequences/ — the packed token
    content itself, (split, shard, seq_idx, tokens, doc_starts), the
    table a trainer reads — and reconciles it stream by stream against
    the placement accounting (invariant 4): per (split, shard) the
    sequence count equals n_seqs, the token mass equals n_tokens, no
    sequence exceeds max_tokens, and at most one (the tail) is short.
    Off by default: placement is metadata-sized, while sequences/
    duplicates the corpus text — at 100 TB you run it when exporting,
    not when auditing."""
    from pyspark.sql import functions as F

    from docling_nlp_api_spark.operators.sampling import (
        materialize_sequences,
        pack_sequences,
        with_split,
    )

    docs = docs.persist()
    # finally: a failed invariant assert or write error must not leave
    # the persisted corpus pinned in executor storage for the session
    try:
        n_in = docs.count()
        # independent token-mass recount for invariant 1 (shares the scan
        # with nothing downstream — this is the auditor, not the pipeline)
        tok_in = (
            docs.select(
                F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
                .cast("long")
                .alias("t")
            )
            .agg(F.sum("t"))
            .first()[0]
            or 0
        )

        placed = pack_sequences(
            with_split(docs), max_tokens=max_tokens, n_shards=shards,
            extra_keys=("split",),
        )
        (
            placed.repartition("split", "shard")
            .sortWithinPartitions("split", "shard", "doc_id")
            .write.mode("overwrite")
            .partitionBy("split")
            .parquet(os.path.join(output, "doc_map"))
        )
        # explicit schema: a zero-row write under partitionBy lands no data
        # files, and schema inference on it would fail the whole job
        doc_map = spark.read.schema(placed.schema).parquet(
            os.path.join(output, "doc_map")
        )

        # per-stream accounting with in-row arithmetic verdicts (invariant
        # 2): one boolean pair per stream, so a violation names its
        # (split, shard) instead of failing an opaque global assert. All
        # integer arithmetic (no double ceil — exact past 2^53 tokens).
        streams = (
            doc_map.groupBy("split", "shard")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
                F.max(F.col("start_off") + F.col("n_tokens")).alias("end_off"),
                # chunk index of the stream's LAST TOKEN (zero-token docs
                # excluded: they occupy no token and may sort past the end)
                F.max(
                    F.when(
                        F.col("n_tokens") > 0,
                        F.expr(f"(start_off + n_tokens - 1) DIV {max_tokens}"),
                    )
                ).alias("last_tok_seq"),
            )
            .select(
                "split",
                "shard",
                "n_docs",
                "n_tokens",
                F.expr(f"(n_tokens + {max_tokens - 1}) DIV {max_tokens}").alias("n_seqs"),
                (F.col("n_tokens") % max_tokens).alias("tail_tokens"),
                # the cumsum must cover the stream end to end (no gap, no
                # overlap): the largest start_off + n_tokens IS the total
                (F.col("end_off") == F.col("n_tokens")).alias("cumsum_ok"),
                # the last token's chunk must be the last sequence
                (
                    F.coalesce(F.col("last_tok_seq"), F.lit(-1))
                    == F.expr(f"(n_tokens + {max_tokens - 1}) DIV {max_tokens}") - 1
                ).alias("chunk_ok"),
            )
        )
        streams.write.mode("overwrite").parquet(os.path.join(output, "streams"))
        streams = spark.read.parquet(os.path.join(output, "streams"))

        per_split = {
            r["split"]: {
                "n_docs": r["d"],
                "n_tokens": r["t"],
                "n_seqs": r["s"],
                "n_streams": r["k"],
            }
            for r in streams.groupBy("split")
            .agg(
                F.sum("n_docs").alias("d"),
                F.sum("n_tokens").alias("t"),
                F.sum("n_seqs").alias("s"),
                F.count("*").alias("k"),
            )
            .collect()
        }
        n_placed = doc_map.count()
        n_distinct = doc_map.select("doc_id").distinct().count()
        tok_placed = sum(v["n_tokens"] for v in per_split.values())
        bad_streams = streams.filter(~F.col("cumsum_ok") | ~F.col("chunk_ok")).count()

        metrics = {
            "n_docs_in": n_in,
            "n_docs_placed": n_placed,
            "n_tokens_in": tok_in,
            "n_tokens_placed": tok_placed,
            "max_tokens": max_tokens,
            "shards": shards,
            "splits": per_split,
            "bad_streams": bad_streams,
        }
        # invariant 1: lossless, duplicate-free placement
        assert n_placed == n_in == n_distinct, metrics
        assert tok_placed == tok_in, metrics
        # invariant 2: every stream's arithmetic reconciles
        assert bad_streams == 0, metrics

        if materialize:
            seqs = materialize_sequences(
                with_split(docs), max_tokens=max_tokens, n_shards=shards,
                extra_keys=("split",),
            )
            (
                seqs.repartition("split", "shard")
                .sortWithinPartitions("split", "shard", "seq_idx")
                .write.mode("overwrite")
                .partitionBy("split")
                .parquet(os.path.join(output, "sequences"))
            )
            # explicit schema: an all-zero-token corpus writes zero sequences
            # (no data files) — inference would raise UNABLE_TO_INFER_SCHEMA
            landed = spark.read.schema(seqs.schema).parquet(
                os.path.join(output, "sequences")
            )
            recon = (
                landed.groupBy("split", "shard")
                .agg(
                    F.count("*").alias("m_seqs"),
                    F.sum(F.size("tokens")).alias("m_tokens"),
                    F.max(F.size("tokens")).alias("m_max"),
                    F.sum((F.size("tokens") < max_tokens).cast("int")).alias("m_short"),
                )
                .join(streams, ["split", "shard"], "full")
                .withColumn(
                    "seq_ok",
                    (F.col("m_seqs") == F.col("n_seqs"))
                    & (F.col("m_tokens") == F.col("n_tokens"))
                    & (F.col("m_max") <= max_tokens)
                    & (F.col("m_short") <= 1),
                )
            )
            # a stream of only zero-token docs has placement rows but no
            # sequences — the full join leaves its materialized side NULL
            bad_mat = recon.filter(
                ~F.coalesce(
                    F.col("seq_ok")
                    | ((F.col("n_tokens") == 0) & F.col("m_seqs").isNull()),
                    F.lit(False),
                )
            ).count()
            metrics["sequences"] = {
                "n_seqs": landed.count(),
                "bad_streams": bad_mat,
            }
            # invariant 4: the materialized content matches the accounting
            assert bad_mat == 0, metrics
            assert metrics["sequences"]["n_seqs"] == sum(
                v["n_seqs"] for v in per_split.values()
            ), metrics
        from docling_nlp_api_spark.session import write_text_file

        # through the Hadoop FS so an hdfs://s3a:// --output root works
        write_text_file(spark, os.path.join(output, "metrics.json"), json.dumps(metrics))
        return metrics
    finally:
        docs.unpersist()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="curated corpus path (parquet dir with doc_id, text)")
    p.add_argument("--tier", help="synthetic tier instead of --input (e.g. sf0.001)")
    p.add_argument("--output", required=True, help="output root (doc_map/streams/metrics)")
    p.add_argument("--max-tokens", type=int, default=512, help="training sequence length")
    p.add_argument("--shards", type=int, default=8, help="packing streams per split")
    p.add_argument("--materialize", action="store_true",
                   help="also write sequences/ (the packed token content)")
    p.add_argument("--cores", type=int, default=None, help="local[N] cores (sandbox only)")
    args = p.parse_args(argv)
    if not args.input and not args.tier:
        p.error("one of --input / --tier is required")

    from docling_nlp_api_spark.session import get_spark

    spark = get_spark("pack_job", cores=args.cores)
    if args.input:
        docs = spark.read.parquet(args.input).select("doc_id", "text")
    else:
        tier_dir = os.environ.get("SPARK_GRAFT_DATA_ROOT", "/root/testdata")
        docs = spark.read.parquet(
            os.path.join(tier_dir, args.tier, "documents.parquet")
        ).select("doc_id", "text")
    metrics = run_pack(
        spark, docs, args.output, args.max_tokens, args.shards,
        materialize=args.materialize,
    )
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
