"""Corpus snapshot versioning: diff two corpus versions into
added / removed / changed / unchanged — the delta audit a periodically
recrawled training corpus runs between snapshots (what changed since the
last training set was cut, and how much of the corpus is churn).

Scale shape: each side is first reduced to (doc_id, md5(text)) — 8 bytes
+ a 32-char hash per doc — so the full-outer equi-join on doc_id never
shuffles document text. At 10^12 docs both hash tables co-partition on
doc_id (the corpus' native Iceberg partitioning), making the join
exchange-free on a real table; the `unchanged` mass is compared but
never materialized row-wise (snapshot_diff emits the DELTA only, the
summary aggregates counts). Exact DuckDB oracles for both forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hashed(side: DataFrame, name: str) -> DataFrame:
    return side.select("doc_id", F.md5("text").alias(f"h_{name}"))


def _status(old: DataFrame, new: DataFrame) -> DataFrame:
    j = _hashed(old, "old").join(_hashed(new, "new"), "doc_id", "full_outer")
    status = (
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_old") != F.col("h_new"), "changed")
        .otherwise("unchanged")
    )
    return j.select("doc_id", status.alias("status"))


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-doc delta between two snapshots: (doc_id, status) for the
    added / removed / changed docs ONLY — unchanged docs (the bulk at
    production churn rates) never leave the join."""
    return _status(old, new).filter(F.col("status") != "unchanged")


def snapshot_diff_summary(old: DataFrame, new: DataFrame) -> DataFrame:
    """Churn accounting over the full join: (status, n_docs) including
    the unchanged mass — four rows, the snapshot-to-snapshot audit line."""
    return _status(old, new).groupBy("status").agg(
        F.count("*").alias("n_docs")
    )
