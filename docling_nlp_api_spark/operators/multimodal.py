"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata (driver brief).

Image metadata is REAL: the fixture's image payloads are genuine PNG
files (minimal 8-bit grayscale, single stored-block zlib stream) and
width/height come from parsing the container header — PNG IHDR bytes
16-24 vectorized over the whole batch, JPEG SOF markers per file — no
codec library needed. Only the PIXEL-level operations (resample bytes,
audio/video duration, frame bytes) remain deterministic stubs: they
genuinely need PIL/ffmpeg, which this container lacks. The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas signature,
partitioning, filter-before-decode — is the real engine surface.

At 100 TB the binary payloads dominate I/O: the metadata extraction reads
only the columns it needs (column pruning keeps payload bytes out of scans
that don't touch them), and decode fans out via mapInPandas with bounded
Arrow batches."""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# planted image geometry: closed forms of doc_id so DuckDB oracles can
# verify the engine's header PARSING against known ground truth
IMG_W = "64 + doc_id % 192"            # [64, 255]
IMG_H = "64 + (doc_id * 7) % 192"      # [64, 255]


def png_bytes(width: int, height: int, fill: int) -> bytes:
    """A real, spec-valid PNG: 8-bit grayscale, one IDAT whose zlib stream
    is a single STORED block (level-0), so the total byte length has the
    closed form 68 + (width+1)*height for raw <= 65535 — which lets a SQL
    oracle predict n_bytes without running zlib."""
    raw = (b"\x00" + bytes([fill]) * width) * height  # filter byte 0 per row
    if len(raw) > 65535:  # single stored block bound
        raise ValueError("png_bytes: raw scanline data exceeds one stored block")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    z = (
        b"\x78\x01"  # CMF/FLG
        + b"\x01"    # BFINAL=1, BTYPE=00 (stored)
        + struct.pack("<H", len(raw))
        + struct.pack("<H", len(raw) ^ 0xFFFF)
        + raw
        + struct.pack(">I", zlib.adler32(raw) & 0xFFFFFFFF)
    )
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", z) + chunk(b"IEND", b"")


def _be32(m: np.ndarray, off: int) -> np.ndarray:
    return (
        (m[:, off].astype(np.int64) << 24)
        | (m[:, off + 1].astype(np.int64) << 16)
        | (m[:, off + 2].astype(np.int64) << 8)
        | m[:, off + 3].astype(np.int64)
    )


def sniff_jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """JPEG dims from the SOF marker segment (no decode): walk the marker
    stream until a start-of-frame (FFC0-FFCF except DHT/JPG/DAC), whose
    payload is [precision u8, height u16be, width u16be, ...]."""
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = int.from_bytes(b[i + 5 : i + 7], "big")
            w = int.from_bytes(b[i + 7 : i + 9], "big")
            return (w, h)
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            i += 2
            continue
        i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
    return None


_HEAD = 24  # PNG sig (8) + IHDR len/tag (8) + width/height (8)


def sniff_image_dims(payloads) -> tuple[np.ndarray, np.ndarray]:
    """(width, height) per payload, -1 where unknown. The PNG path is
    vectorized: one bytes-join builds an (n, 24) uint8 header matrix and
    the signature test + IHDR big-endian reads run as numpy column ops —
    no per-row Python on the (dominant) PNG share. Non-PNG rows fall back
    to the per-file JPEG marker walk."""
    blobs = [bytes(p) for p in payloads]
    n = len(blobs)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    heads = np.frombuffer(
        b"".join(b[:_HEAD].ljust(_HEAD, b"\0") for b in blobs), dtype=np.uint8
    ).reshape(n, _HEAD)
    sig = np.frombuffer(PNG_SIG + b"\0\0\0\rIHDR", dtype=np.uint8)  # sig + IHDR len/tag
    is_png = (heads[:, :16] == sig).all(axis=1)
    w = np.where(is_png, _be32(heads, 16), -1)
    h = np.where(is_png, _be32(heads, 20), -1)
    for i in np.nonzero(~is_png)[0]:  # rare fallback path
        dims = sniff_jpeg_dims(blobs[i])
        if dims is not None:
            w[i], h[i] = dims
    return w, h

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


@F.pandas_udf(T.BinaryType())
def _media_payload(doc_id: pd.Series, media_type: pd.Series, text: pd.Series) -> pd.Series:
    """Fixture payload builder: image rows get a REAL PNG with planted
    dims (IMG_W/IMG_H closed forms of doc_id, fill byte doc_id % 251);
    audio/video rows keep the opaque utf-8 stand-in (a real container
    would need ffmpeg to even synthesize)."""
    out = []
    for d, m, t in zip(doc_id, media_type, text):
        if m == "image":
            d = int(d)
            out.append(png_bytes(64 + d % 192, 64 + (d * 7) % 192, d % 251))
        else:
            out.append(t.encode("utf-8"))
    return pd.Series(out)


def as_media_table(docs: DataFrame) -> DataFrame:
    """Model the documents table as a media table: media_type derived from
    doc_id; image payloads are real PNG bytes, audio/video payloads the
    opaque utf-8 stand-in."""
    mt = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        _media_payload(F.col("doc_id"), mt, F.col("text")).alias("payload"),
    )


def _stub_duration(payload: bytes) -> int:
    """Deterministic stand-in for audio/video duration (ffmpeg absent —
    the one remaining codec stub; image dims are real header parses)."""
    h = hashlib.md5(payload).digest()
    return 1000 + int.from_bytes(h[:2], "big") % 60000


def extract_media_metadata(media: DataFrame, with_features: bool = False) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched). Image
    width/height are REAL container-header parses (PNG IHDR vectorized
    over the batch, JPEG SOF fallback — sniff_image_dims); audio/video
    duration is the md5 stub (needs ffmpeg)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            is_img = (pdf["media_type"] == "image").to_numpy()
            w = np.full(n, -1, dtype=np.int64)
            h = np.full(n, -1, dtype=np.int64)
            if is_img.any():
                w[is_img], h[is_img] = sniff_image_dims(pdf["payload"].to_numpy()[is_img])
            dur = [
                None if im else _stub_duration(bytes(p))
                for im, p in zip(is_img, pdf["payload"])
            ]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.array([int(x) if x >= 0 else None for x in w], dtype="Int32"),
                    "height": pd.array([int(x) if x >= 0 else None for x in h], dtype="Int32"),
                    "duration_ms": pd.array(dur, dtype="Int64"),
                }
            )
            if with_features:
                # deterministic fake embedding (stands in for a vision tower)
                feats = [
                    np.frombuffer(hashlib.md5(bytes(p)).digest(), dtype=np.uint8)[:8].astype("float32") / 255.0
                    for p in pdf["payload"]
                ]
                out["feature"] = feats
            else:
                out["feature"] = None
            yield out

    return media.mapInPandas(run, schema=MEDIA_META_SCHEMA)


def media_meta_sql_equivalent(docs: DataFrame) -> DataFrame:
    """The SQL-expressible projection of the metadata extraction — the
    planted ground truth the header-parsing path must reproduce: image
    dims are the IMG_W/IMG_H closed forms and n_bytes the stored-block
    PNG length formula 68 + (w+1)*h (see png_bytes)."""
    mt = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int"))
    w = F.expr(IMG_W).cast("int")
    h = F.expr(IMG_H).cast("int")
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.when(mt == "image", (F.lit(68) + (w + 1).cast("long") * h).cast("long"))
        .otherwise(F.octet_length(F.encode("text", "UTF-8")).cast("long"))
        .alias("n_bytes"),
        F.when(mt == "image", w).alias("width"),
        F.when(mt == "image", h).alias("height"),
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
    Source dims come from the REAL container header (sniff_image_dims);
    only the pixel resample is the deterministic fake (md5-tiled bytes of
    the right length — a real deployment swaps in PIL). The mapInPandas
    batch shape, filter-before-decode (only image rows ever decode), and
    typed output schema are the real engine surface."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs = sniff_image_dims(pdf["payload"].to_numpy())
            w_l, h_l, ow_l, oh_l, ob_l, th_l = [], [], [], [], [], []
            for p, w, h in zip(pdf["payload"], ws, hs):
                w, h = int(w), int(h)
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
                dur = _stub_duration(bytes(p))
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
