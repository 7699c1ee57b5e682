"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata (driver brief). The decode step is STUBBED (no image/audio libs in
this container) behind a deterministic fake, but the Spark-side plumbing —
schema, Arrow batch shape, mapInPandas signature, partitioning — is real
and tested.

At 100 TB the binary payloads dominate I/O: the metadata extraction reads
only the columns it needs (column pruning keeps payload bytes out of scans
that don't touch them), and decode fans out via mapInPandas with bounded
Arrow batches."""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def as_media_table(docs: DataFrame) -> DataFrame:
    """Model the documents table as a media table: payload = utf-8 bytes of
    text (the opaque binary stand-in), media_type derived from doc_id."""
    mt = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def _fake_decode(payload: bytes, media_type: str):
    """Deterministic stand-in for a real decoder (PIL/ffmpeg absent here).
    A real deployment swaps this for the actual decode; the Spark plumbing
    (batching, schema, partitioning) is identical."""
    h = hashlib.md5(payload).digest()
    if media_type == "image":
        return 64 + h[0] % 192, 64 + h[1] % 192, None
    if media_type in ("audio", "video"):
        return None, None, 1000 + int.from_bytes(h[:2], "big") % 60000
    raise NotImplementedError(f"unknown media type: {media_type}")


def extract_media_metadata(media: DataFrame, with_features: bool = False) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched). Vectorized
    per batch; the md5 'decode' stands in for the real codec call."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            dims = [_fake_decode(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.array([d[0] for d in dims], dtype="Int32"),
                    "height": pd.array([d[1] for d in dims], dtype="Int32"),
                    "duration_ms": pd.array([d[2] for d in dims], dtype="Int64"),
                }
            )
            if with_features:
                # deterministic fake embedding (stands in for a vision tower)
                feats = [
                    np.frombuffer(hashlib.md5(p).digest(), dtype=np.uint8)[:8].astype("float32") / 255.0
                    for p in pdf["payload"]
                ]
                out["feature"] = feats
            else:
                out["feature"] = None
            yield out

    return media.mapInPandas(run, schema=MEDIA_META_SCHEMA)


def media_meta_sql_equivalent(docs: DataFrame) -> DataFrame:
    """The SQL-expressible projection of the metadata extraction (byte
    length + md5-derived dims) — used as the DuckDB-checkable catalog entry."""
    mt = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int"))
    h = F.md5("text")
    hexint = lambda pos: F.conv(F.substring(h, pos, 2), 16, 10).cast("long")  # noqa: E731
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        F.when(mt == "image", (64 + hexint(1) % 192).cast("int")).alias("width"),
        F.when(mt == "image", (64 + hexint(3) % 192).cast("int")).alias("height"),
    )
