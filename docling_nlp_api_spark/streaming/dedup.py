"""Streaming ingestion-time dedup: keep only the FIRST occurrence of
each content hash across micro-batches — the gate a continuous corpus
ingest runs so re-crawled / re-uploaded documents never reach the sink
twice (the streaming twin of operators/dedup.exact_dedup, and the stream
form of the reference's md5-named upload dedup, routes/documents.py).

Custom stateful operator (applyInPandasWithState, NoTimeout): state is
one marker per content hash; a key's first micro-batch emits its minimal
doc_id, every later batch (and every later duplicate) emits nothing. At
cluster scale the state store shards by hash across executors — state
size is #distinct-docs keys of a few bytes each, and RocksDB state
backends spill it; no corpus text is ever held in state.

Determinism contract (what the exact oracle pins): chunks are staged in
ascending doc_id order and duplicates within one micro-batch resolve to
the batch-minimal doc_id, so "first seen" == global MIN(doc_id) per hash
— exactly `SELECT md5(text), MIN(doc_id) ... GROUP BY 1` in the oracle.
On an unordered production stream the emitted doc_id is arrival-order
dependent (as ingestion-time dedup inherently is); the INVARIANT part —
one row per distinct hash, ever — holds regardless of order.
"""

from __future__ import annotations

import glob
import math
import os
import shutil
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOC_SCHEMA = "doc_id long, text string"


def stage_doc_chunks(df: DataFrame, out_dir: str, n_chunks: int = 3) -> str:
    """Stage a (doc_id, text) frame as n_chunks flat parquet files in
    ascending doc_id order (chunk k+1 strictly later) — the deterministic
    simulated arrival stream, doc-table flavor of stage_event_chunks.
    The global row_number window is staging harness code, not an engine
    operator (test-scale only)."""
    from pyspark.sql import Window

    rn = df.withColumn("rn", F.row_number().over(Window.orderBy("doc_id")))
    n = df.count()
    per = math.ceil(n / n_chunks)
    os.makedirs(out_dir, exist_ok=True)
    for k in range(n_chunks):
        tmp = os.path.join(out_dir, "_stage_tmp")
        (
            rn.filter((F.col("rn") > k * per) & (F.col("rn") <= (k + 1) * per))
            .drop("rn")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(part, os.path.join(out_dir, f"chunk_{k:03d}.parquet"))
        shutil.rmtree(tmp)
    return out_dir


def read_doc_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """File-source readStream over a staged document drop zone."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(src_dir)


def _first_seen_update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (h,) = key
    first = None
    for pdf in pdfs:
        m = int(pdf["doc_id"].min())
        first = m if first is None else min(first, m)
    if state.exists:
        return  # hash already emitted in an earlier micro-batch
    state.update((1,))
    yield pd.DataFrame([{"h": h, "doc_id": first}])


def first_seen_stream(docs: DataFrame) -> DataFrame:
    """(h, doc_id): one row per distinct content hash, emitted by the
    first micro-batch that carries it (batch-minimal doc_id)."""
    keyed = docs.select(F.md5("text").alias("h"), "doc_id")
    return keyed.groupBy("h").applyInPandasWithState(
        _first_seen_update,
        outputStructType="h string, doc_id long",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
