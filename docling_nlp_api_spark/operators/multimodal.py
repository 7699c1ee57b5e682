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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("out_bytes", T.LongType(), False),
        T.StructField("thumbnail", T.BinaryType(), False),
    ]
)


def resize_images(media: DataFrame, target_w: int = 64) -> DataFrame:
    """Resize plumbing (driver brief): scale-to-width preserving aspect
    (out_h = h*target_w // w), emit an RGB-sized thumbnail payload.
    The pixel resample is the deterministic fake (md5-tiled bytes of the
    right length — a real deployment swaps in PIL); the mapInPandas batch
    shape, filter-before-decode (only image rows ever decode), and typed
    output schema are the real engine surface."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w_l, h_l, ow_l, oh_l, ob_l, th_l = [], [], [], [], [], []
            for p in pdf["payload"]:
                w, h, _ = _fake_decode(bytes(p), "image")
                ow = min(target_w, w)
                oh = max(1, h * ow // w)
                n = ow * oh * 3
                seed = hashlib.md5(bytes(p)).digest()
                th = (seed * (n // len(seed) + 1))[:n]
                w_l.append(w); h_l.append(h); ow_l.append(ow); oh_l.append(oh)
                ob_l.append(n); th_l.append(th)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.array(w_l, dtype="int32"),
                    "height": pd.array(h_l, dtype="int32"),
                    "out_width": pd.array(ow_l, dtype="int32"),
                    "out_height": pd.array(oh_l, dtype="int32"),
                    "out_bytes": pd.array(ob_l, dtype="int64"),
                    "thumbnail": th_l,
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_video_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plumbing (driver brief): one row in -> N frame rows
    out (floor(duration/every_ms)+1 frames at 0, every_ms, ...). The 1->N
    fan-out INSIDE mapInPandas is the real engine concern (output batches
    larger than input batches); the frame bytes are the deterministic
    fake (md5(payload || frame_idx))."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                _, _, dur = _fake_decode(bytes(p), "video")
                n = dur // every_ms + 1
                for i in range(n):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(hashlib.md5(bytes(p) + i.to_bytes(4, "little")).digest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "ts_ms": pd.array(tss, dtype="int64"),
                    "frame": frames,
                }
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(run, schema=FRAME_SCHEMA)
