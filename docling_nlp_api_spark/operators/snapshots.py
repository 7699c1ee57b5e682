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


OVERLAP_K = 32  # minhash components for the corpus-overlap estimate


def corpus_overlap(old: DataFrame, new: DataFrame, k: int = OVERLAP_K) -> DataFrame:
    """Corpus-level CONTENT overlap between two snapshots — the question
    snapshot_diff cannot answer (diff keys on doc_id; recrawls reassign
    ids, so a re-keyed identical corpus diffs as 100% churn). Treats each
    side as one giant set of hashed 3-word shingles and reports, in ONE
    row: exact set sizes, exact intersection and Jaccard, AND the
    k-component minhash estimate (per permutation, the corpus-wide min on
    each side; P(mins agree) = J) computed side-by-side as its own
    accuracy audit.

    Scale shape: the exact path shuffles DISTINCT shingle hashes (longs)
    once per side and equi-joins them — exact but corpus-sized. The
    estimator path is the 100 TB answer: each side partial-aggregates k
    mins map-side, so ONE k-long row per side crosses the exchange —
    O(1) state, mergeable across shards/snapshots, and the pattern that
    replaces the exact join when snapshots live in different stores.
    Same deterministic universal-hash family as the minhash plane
    (mh_constants), so the DuckDB oracle reproduces it bit-exactly."""
    from .dedup import _perm, mh_constants, shingle_hashes_flat  # noqa: F401

    def side(df: DataFrame, name: str):
        flat = shingle_hashes_flat(df).select("h").distinct()
        mins = flat.agg(*[F.min(_perm(i, k)).alias(f"m{i}_{name}") for i in range(k)])
        return flat.withColumnRenamed("h", f"h_{name}"), mins

    flat_o, mins_o = side(old, "old")
    flat_n, mins_n = side(new, "new")
    n_old = flat_o.agg(F.count("*").alias("n_shingles_old"))
    n_new = flat_n.agg(F.count("*").alias("n_shingles_new"))
    common = flat_o.join(
        flat_n, flat_o.h_old == flat_n.h_new
    ).agg(F.count("*").alias("n_common"))
    # coalesce: an empty side makes every F.min NULL, and NULL == x is
    # NULL, which would NULL-propagate through the sum; the defined
    # answer (and the oracle's CASE WHEN ... THEN 1 ELSE 0) is 0
    agree = sum(
        F.coalesce(F.col(f"m{i}_old") == F.col(f"m{i}_new"), F.lit(False))
        .cast("long")
        for i in range(k)
    )
    uni = F.col("n_shingles_old") + F.col("n_shingles_new") - F.col("n_common")
    return (
        n_old.crossJoin(F.broadcast(n_new))
        .crossJoin(F.broadcast(common))
        .crossJoin(F.broadcast(mins_o))
        .crossJoin(F.broadcast(mins_n))
        .select(
            "n_shingles_old",
            "n_shingles_new",
            "n_common",
            F.round(F.col("n_common") / uni, 4).alias("jaccard_exact"),
            F.lit(k).cast("long").alias("k"),
            agree.alias("n_agree"),
            F.round(agree / F.lit(k), 4).alias("jaccard_est"),
        )
    )
