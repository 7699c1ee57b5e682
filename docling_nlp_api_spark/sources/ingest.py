"""Ingestion sources (SURVEY.md §2.1 S1-S3): file bytes -> governed rows.

The reference ingests one uploaded file at a time (save_upload_file,
file_utils.py:15-43: md5-prefixed name, size guard, ext allow-list at
:104-110). At 100 TB the same contract is a distributed `binaryFile` scan:
Spark lists + reads files in parallel across executors, the guards become
filters, and rejects land in a quarantine split instead of an HTTP 400 —
the pipeline never dies on a bad input (docling_service.py:82-91 semantics).

URL fetch (S2, file_utils.py:46-89) stays out-of-engine per SURVEY §2.1 —
network I/O is a fetch tier, not an engine operator — and is shipped as
`tools/fetch_to_landing.py`: a driver-side chunked fetcher (pre +
in-flight size abort, content-disposition naming, md5-prefixed landing
names, per-URL error rows) whose landing directory this module's
binaryfile_ingest then scans (tests/test_fetch_to_landing.py covers the
handoff end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scalars import ALLOWED_EXTS

MAX_FILE_BYTES = 50 * 1024 * 1024  # config.py:18 (50 MB upload ceiling)


def binaryfile_ingest(spark: SparkSession, glob_path: str) -> DataFrame:
    """S1/S3: distributed binary scan -> (name, md5-prefixed name, size,
    ext, accepted) rows. Deterministic columns only: path is reduced to its
    basename and modificationTime is dropped, so re-ingesting the same
    bytes yields identical rows anywhere."""
    raw = spark.read.format("binaryFile").load(glob_path)
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.lower(F.regexp_extract(name, r"(\.[^.]+)$", 1))
    stored = F.concat(F.substring(F.md5(F.col("content")), 1, 8), F.lit("_"), name)
    return raw.select(
        name.alias("name"),
        stored.alias("stored_name"),
        # binaryFile's `length` metadata column — free from the file
        # listing; F.length(content) would re-scan up to MAX_FILE_BYTES
        # of payload per row to recompute a number the source provides
        F.col("length").alias("n_bytes"),
        ext.alias("ext"),
        (ext.isin(*ALLOWED_EXTS) & (F.col("length") <= MAX_FILE_BYTES)).alias("accepted"),
        F.md5("content").alias("content_md5"),
    )


def ingest_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry: ingest every parquet object of the tier as raw bytes
    and report the accept/quarantine split per extension. Rows-only check
    (file bytes are not visible to the SQL oracle's table views)."""
    df = binaryfile_ingest(spark, f"{sf_dir}/*.parquet")
    return (
        df.groupBy("ext", "accepted")
        .agg(F.count("*").alias("n_files"), F.sum("n_bytes").alias("total_bytes"))
        .orderBy("ext", "accepted")
    )
