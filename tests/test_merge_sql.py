"""MERGE INTO / DELETE FROM (S10/F5): the Iceberg-facing SQL is tested
code — parse-validated through Spark's SQL parser — and the sandbox
fallback executes the same semantics with a swap-commit protocol.

Why not execute MERGE directly: the pyspark distribution ships no v2
catalog with row-level-operation support (no Iceberg/Delta jars); v1 file
sources reject MERGE/DELETE at analysis. The parse test pins that our SQL
is syntactically what a cluster with an Iceberg catalog would accept."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_nlp_api_spark.plans.merge import (
    apply_merge_to_state,
    apply_ttl_delete_to_state,
    merge_upsert_sql,
    ttl_delete_sql,
)


def _parse(spark, sql: str):
    # sessionState.sqlParser.parsePlan raises ParseException on bad syntax
    # and returns a logical plan without touching the (absent) catalog
    return spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


def test_merge_sql_parses(spark):
    plan = _parse(spark, merge_upsert_sql())
    s = plan.toString()
    assert "MergeIntoTable" in s or "merge" in s.lower()


def test_delete_sql_parses(spark):
    plan = _parse(spark, ttl_delete_sql())
    assert "DeleteFromTable" in plan.toString() or "delete" in plan.toString().lower()


def test_bad_merge_sql_rejected(spark):
    with pytest.raises(Exception):
        _parse(spark, "MERGE INTO t USING s WHEN MATCHED THEN FROB")


def test_merge_state_semantics(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(1, "click", 2, 10.0), (2, "view", 1, 5.0)],
        "user_id int, event_type string, calls int, total_value double",
    )
    b2 = spark.createDataFrame(
        [(1, "click", 3, 7.5), (3, "view", 4, 1.0)],
        "user_id int, event_type string, calls int, total_value double",
    )
    apply_merge_to_state(spark, state_dir, b1)
    out = apply_merge_to_state(spark, state_dir, b2)
    got = {(r["user_id"], r["event_type"]): (r["calls"], r["total_value"]) for r in out.collect()}
    assert got == {
        (1, "click"): (5, 17.5),  # matched -> accumulated
        (2, "view"): (1, 5.0),    # untouched
        (3, "view"): (4, 1.0),    # not matched -> inserted
    }


def test_merge_state_idempotent_replay(spark, tmp_path):
    """Re-applying a batch after a crash-before-checkpoint must be the
    caller's dedup concern (same as Iceberg MERGE); the commit itself is
    atomic: a failed staging write never corrupts 'current'."""
    state_dir = str(tmp_path / "state")
    b = spark.createDataFrame([(1, "click", 2, 10.0)],
                              "user_id int, event_type string, calls int, total_value double")
    apply_merge_to_state(spark, state_dir, b)
    import os
    assert os.path.isdir(os.path.join(state_dir, "current"))
    assert not os.path.isdir(os.path.join(state_dir, "_staged"))
    assert not os.path.isdir(os.path.join(state_dir, "_old"))


def test_ttl_delete_semantics(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    rows = spark.createDataFrame(
        [(1, "2024-01-29 23:59:59"), (2, "2024-01-30 00:00:00"), (3, "2024-02-01 00:00:00")],
        "id int, expires_at string",
    ).select("id", F.col("expires_at").cast("timestamp").alias("expires_at"))
    import os
    os.makedirs(state_dir, exist_ok=True)
    rows.write.parquet(os.path.join(state_dir, "current"))
    out = apply_ttl_delete_to_state(spark, state_dir, "2024-01-30 00:00:00")
    # strict '<': the row expiring exactly at now survives (F5 semantics)
    assert sorted(r["id"] for r in out.collect()) == [2, 3]


def test_ttl_delete_keeps_null_expiry_and_rejects_bad_now(spark, tmp_path):
    """SQL three-valued DELETE semantics: WHERE expires_at < now removes
    only rows whose predicate is TRUE, so NULL expires_at (never-expiring
    rows) must SURVIVE — a bare ~(a < b) filter silently deleted them.
    And a malformed now_ts must raise driver-side instead of casting to
    NULL and wiping the entire table."""
    import os

    import pytest as _pytest

    state_dir = str(tmp_path / "state")
    rows = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, None), (3, "2024-02-01 00:00:00")],
        "id int, expires_at string",
    ).select("id", F.col("expires_at").cast("timestamp").alias("expires_at"))
    os.makedirs(state_dir, exist_ok=True)
    rows.write.parquet(os.path.join(state_dir, "current"))
    out = apply_ttl_delete_to_state(spark, state_dir, "2024-01-30 00:00:00")
    assert sorted(r["id"] for r in out.collect()) == [2, 3]
    with _pytest.raises(ValueError):
        apply_ttl_delete_to_state(spark, state_dir, "not-a-timestamp")
    # the failed call must not have touched state
    cur = spark.read.parquet(os.path.join(state_dir, "current"))
    assert sorted(r["id"] for r in cur.collect()) == [2, 3]


def test_merge_state_recovers_from_crash_between_renames(spark, tmp_path):
    """The swap protocol's worst crash window: current/ already moved to
    _old/, replacement not yet in place. The next operation must restore
    the backup instead of treating state as empty (which would merge
    against nothing and then DELETE the only surviving copy)."""
    import os
    import shutil

    state_dir = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(1, "click", 2, 10.0)],
        "user_id int, event_type string, calls int, total_value double",
    )
    apply_merge_to_state(spark, state_dir, b1)
    # simulate the crash: rename current -> _old, leave no current/
    os.rename(os.path.join(state_dir, "current"), os.path.join(state_dir, "_old"))
    b2 = spark.createDataFrame(
        [(1, "click", 3, 7.5)],
        "user_id int, event_type string, calls int, total_value double",
    )
    out = apply_merge_to_state(spark, state_dir, b2)
    got = {(r["user_id"], r["event_type"]): (r["calls"], r["total_value"]) for r in out.collect()}
    assert got == {(1, "click"): (5, 17.5)}  # b1 survived the crash

    # stale _old beside a live current (crash after swap, before cleanup)
    shutil.copytree(os.path.join(state_dir, "current"), os.path.join(state_dir, "_old"))
    out2 = apply_merge_to_state(spark, state_dir, b2)
    got2 = {(r["user_id"], r["event_type"]): (r["calls"], r["total_value"]) for r in out2.collect()}
    assert got2 == {(1, "click"): (8, 25.0)}
    assert not os.path.isdir(os.path.join(state_dir, "_old"))


def test_merge_batch_marker_commits_atomically_with_state(spark, tmp_path):
    """The streaming batch id rides the same rename as the data (staged
    as an underscore file parquet readers ignore), so a foreachBatch
    replay is detectable via last_committed_batch and the additive merge
    becomes exactly-once."""
    from docling_nlp_api_spark.plans.merge import last_committed_batch

    state_dir = str(tmp_path / "state")
    b = spark.createDataFrame(
        [(1, "click", 2, 10.0)],
        "user_id int, event_type string, calls int, total_value double",
    )
    assert last_committed_batch(state_dir) is None
    out = apply_merge_to_state(spark, state_dir, b, batch_marker=0)
    assert last_committed_batch(state_dir) == 0
    # the marker file must be invisible to the parquet read
    assert out.count() == 1
    apply_merge_to_state(spark, state_dir, b, batch_marker=1)
    assert last_committed_batch(state_dir) == 1


def test_ttl_rewrite_preserves_stream_batch_marker(spark, tmp_path):
    """A non-streaming rewrite of the same state dir (TTL delete, an
    unmarked batch merge) must carry the streaming _BATCH marker forward
    through its swap — dropping it would make a post-rewrite replay of
    the last micro-batch look fresh and double-apply the additive merge."""
    import os

    from docling_nlp_api_spark.plans.merge import last_committed_batch

    state_dir = str(tmp_path / "state")
    b = spark.createDataFrame(
        [(1, "click", 2, 10.0)],
        "user_id int, event_type string, calls int, total_value double",
    )
    apply_merge_to_state(spark, state_dir, b, batch_marker=7)
    assert last_committed_batch(state_dir) == 7

    # state rows need an expires_at column for the TTL op: rebuild state
    rows = spark.createDataFrame(
        [(1, "2024-02-01 00:00:00")], "id int, expires_at string"
    ).select("id", F.col("expires_at").cast("timestamp").alias("expires_at"))
    cur = os.path.join(state_dir, "current")
    import shutil as _sh
    marker = open(os.path.join(cur, "_BATCH")).read()
    _sh.rmtree(cur)
    rows.write.parquet(cur)
    with open(os.path.join(cur, "_BATCH"), "w") as f:
        f.write(marker)

    apply_ttl_delete_to_state(spark, state_dir, "2024-01-30 00:00:00")
    assert last_committed_batch(state_dir) == 7  # marker survived the swap
    # a second unmarked rewrite keeps carrying it
    apply_ttl_delete_to_state(spark, state_dir, "2024-01-31 00:00:00")
    assert last_committed_batch(state_dir) == 7
