"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship extraction query at sf0.001.
- ``queries()``: one entry per implemented operator (SURVEY.md §2 + the
  training-pipeline planes), each (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``: exact DuckDB equivalents (see catalog.py parity rules).
  Extraction-plane entries are non-SQL-expressible (custom vectorized
  kernels); they are rows-only here and exactness is proven by the pytest
  span-equality suite against the single-node oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from docling_nlp_api_spark.catalog import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract sf0.001 spans tier end-to-end, return completed
    docs with their word counts and media flags (the reference's
    ProcessingResponse plane, SURVEY §3.1)."""
    from pyspark.sql import functions as F

    from docling_nlp_api_spark.datagen import spans_df
    from docling_nlp_api_spark.operators.exports import full_text_col
    from docling_nlp_api_spark.operators.extract import extract

    out = extract(spans_df(spark, 500))
    return out.select(
        "doc_id",
        "status",
        F.size("spans").alias("n_spans"),
        F.col("metadata")["word_count"].cast("long").alias("word_count"),
        (F.col("metadata")["has_images"] == "true").alias("has_images"),
        F.length(full_text_col(F.col("spans"))).alias("text_len"),
    ).filter(F.col("status") == "completed")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
