"""Structured Streaming forms of the T-plane (SURVEY.md §2.9).

The reference's temporal behaviors are request-path side effects over
Firestore (analytics fire-and-forget T1, TTL expiry T2, tumbling "today"
stats T3, sliding rate-limit windows T4, read-modify-write upsert state
T5 — file:line anchors in SURVEY §2.9). The batch forms live in
operators/analytics.py; this module is the streaming plane proper:
`readStream` file source -> event-time windowed aggregations with
watermarks -> memory/`foreachBatch` sinks, plus a custom stateful
operator via `applyInPandasWithState` (per-user running totals with
event-time TTL eviction — the scale path for reference `db.py:100-120`'s
lazy per-row expiry).

At 100 TB-scale these run unchanged against a Kafka/files drop zone: the
file source here is the sandbox stand-in (same DataFrame program, same
state-store semantics, different `format()`).

API adjudication (round 4): Spark 4's `transformWithStateInPandas` —
the successor stateful API (timers, multiple state variables, RocksDB-
first) — was prototyped and is SANDBOX-BLOCKED: its driver worker
imports `google.protobuf` (pyspark
`streaming/proto/StateMessage_pb2.py`), which is not installed here and
cannot be (no pip index). `applyInPandasWithState` is therefore the
stateful API throughout; on a cluster with protobuf present, T5/T7
translate mechanically (ValueState per key replaces the state tuple).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stage_event_chunks(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 4,
    flush_horizon_days: int | None = None,
) -> str:
    """Split the batch events table into n_chunks FLAT parquet files under
    out_dir in EVENT-TIME order — a deterministic simulated arrival
    stream where chunk k+1 is never earlier than chunk k. Chunks are cut
    on a (ts, event_id) row-number rank, NOT raw event_id ranges: the sf
    generator happens to assign event_id in ts order, but other event
    tables (e.g. tools/make_star_tier.py hashes ts from event_id) do not,
    and id-range chunks over such input would interleave event time
    across micro-batches — downstream watermarks would then silently
    drop the out-of-order rows and diverge from the batch oracle. The
    global sort is test-harness staging cost, not an engine plan.
    Flat files, not chunk=k subdirs: the
    file source would otherwise partition-infer a `chunk` column that
    clashes with the explicit schema; staging order also fixes the
    source's (mtime, path) processing order.

    flush_horizon_days: when set, append ONE sentinel event (user_id=-1,
    ts = max ts + horizon) as a trailing chunk — it drags the watermark
    past every real window so append-mode sinks (session windows) emit
    their final state; consumers filter user_id = -1 back out."""
    import glob
    import shutil

    from pyspark.sql import Window

    # persist: the ranked frame is re-read once per chunk below; without
    # the pin each filter+write job re-runs the global (ts, event_id)
    # sort — n_chunks full sorts instead of one (harness staging, but no
    # reason to pay it)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).withColumn(
        "_rn", F.row_number().over(Window.orderBy("ts", "event_id")) - 1
    ).persist()
    # try/finally: a failed chunk write must not leak the cached frame
    # for the session lifetime (same guard as curation_job/dedup_job)
    try:
        n = ev.count()
        per = (n + n_chunks - 1) // n_chunks
        os.makedirs(out_dir, exist_ok=True)
        for k in range(n_chunks):
            tmp = os.path.join(out_dir, "_stage_tmp")
            (
                ev.filter((F.col("_rn") >= k * per) & (F.col("_rn") < (k + 1) * per))
                .drop("_rn")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
            shutil.move(part, os.path.join(out_dir, f"chunk_{k:03d}.parquet"))
            shutil.rmtree(tmp)
        if flush_horizon_days is not None:
            tmp = os.path.join(out_dir, "_stage_tmp")
            (
                ev.agg(F.max("ts").alias("mx"))
                .select(
                    F.lit(n).cast("long").alias("event_id"),
                    (F.col("mx") + F.expr(f"INTERVAL {flush_horizon_days} DAYS")).alias("ts"),
                    F.lit(-1).cast("long").alias("user_id"),
                    F.lit("_flush").alias("event_type"),
                    F.lit(0.0).alias("value"),
                    F.lit("{}").alias("props"),
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
            shutil.move(part, os.path.join(out_dir, f"chunk_{n_chunks:03d}.parquet"))
            shutil.rmtree(tmp)
    finally:
        ev.unpersist()
    return out_dir


def read_event_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """File-source readStream over a staged drop-zone directory.
    maxFilesPerTrigger=1 makes each staged chunk its own micro-batch, so
    watermark advancement between chunks is exercised deterministically."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(src_dir)


def session_counts_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """T6 streaming form: per-user SESSION windows — the genuinely
    streaming-native stateful concept (windows merge as events arrive;
    the state store holds open sessions until the watermark passes their
    end). Batch twin: analytics.sessionize (lag + boundary cumsum).

    Boundary semantics (pinned by the planted pytest): session_window
    merges an event landing AT the open session's end (inclusive — an
    exactly-gap-sized hole does NOT split), matching sessionize's strict
    `> gap` split exactly; the only delta is the emitted end, which is
    last-event + gap rather than last-event.

    Append mode only (merging windows cannot re-emit in complete mode):
    results flush when the watermark passes a session's end, so a
    finished drop-zone run needs one trailing sentinel event past every
    real session (stage_event_chunks flush_horizon_days) — the batch-
    equality harness's stand-in for a live stream's continuing traffic."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("end_us"),
            "n_events",
        )
    )


def daily_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T3 streaming form: tumbling 1-day event-time windows per type
    (reference "today" rollup, analytics_service.py:78-79) with a late-data
    watermark (T2: rows later than the watermark are dropped by the state
    store, the streaming analog of TTL expiry)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("date"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def sliding_rate_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T4 streaming form: sliding 1-hour windows every 15 minutes — the
    rate-limiter's window counts (rate_limit.py:113-129) computed on the
    stream instead of per-request."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "cnt",
            "approx_users",
        )
    )


_STATE_SCHEMA = "events long, total_value double, last_ts timestamp"
_USER_OUT_SCHEMA = "user_id long, events long, total_value double, expired boolean"


def _make_user_totals_update(ttl_ms: int):
    """Build the applyInPandasWithState update function. Per-user running
    totals with event-time TTL: state carries (events, total_value,
    last_ts); a key idle past the TTL (no events before the watermark
    caught up) times out, emits a tombstone row and is evicted —
    reference db.py:100-120's lazy expiry, but pushed to the state store
    where eviction scales with keys, not with table scans."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            events, total_value, _ = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "events": events, "total_value": total_value, "expired": True}]
            )
            return
        events, total_value = 0, 0.0
        last_ts = None
        if state.exists:
            events, total_value, last_ts = state.get
        for pdf in pdfs:
            events += len(pdf)
            total_value += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last_ts = mx if last_ts is None else max(last_ts, mx)
        state.update((events, round(total_value, 2), last_ts))
        # TTL clock is event time: expire the key ttl_ms after its newest event
        state.setTimeoutTimestamp(int(pd.Timestamp(last_ts).timestamp() * 1000) + ttl_ms)
        yield pd.DataFrame(
            [{"user_id": user_id, "events": events, "total_value": round(total_value, 2), "expired": False}]
        )

    return update


def user_totals_stream(
    events: DataFrame, watermark: str = "1 hour", ttl_days: float = 3.0
) -> DataFrame:
    """T2+T5 streaming form: custom stateful operator
    (applyInPandasWithState, event-time timeout) keyed by user_id."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_user_totals_update(int(ttl_days * 86400 * 1000)),
            outputStructType=_USER_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def upsert_stream_foreach_batch(
    events: DataFrame, state_dir: str, checkpoint_dir: str
):
    """T5 streaming form: incremental keyed upsert state via foreachBatch —
    each micro-batch MERGEs its per-(user, date) counts into the parquet
    state table through plans/merge.apply_merge_to_state (the sandbox
    MERGE INTO with the atomic-swap commit; reference read-modify-write
    analytics_service.py:140-174). Returns the started StreamingQuery.

    Replay safety: foreachBatch is at-least-once — after a crash between
    the state commit and the engine's WAL commit, the SAME batch_id is
    redelivered on restart. The merge is additive, so blindly re-applying
    would double-count; the batch id therefore commits atomically WITH
    the state (apply_merge_to_state's batch_marker rides the same swap
    rename) and a redelivered id is skipped — exactly-once for this
    sink. state_dir pairs with checkpoint_dir for a stream's lifetime
    (batch ids are checkpoint-scoped; pointing a FRESH checkpoint at an
    old state dir restarts ids at 0 and is not a supported resume)."""
    from ..plans.merge import apply_merge_to_state, last_committed_batch

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        last = last_committed_batch(state_dir)
        if last is not None and batch_id <= last:
            return  # redelivered micro-batch: its delta is already in state
        delta = (
            batch_df.groupBy(
                "user_id", F.date_format("ts", "yyyy-MM-dd").alias("date")
            )
            .agg(F.count("*").alias("api_calls"))
        )
        apply_merge_to_state(
            batch_df.sparkSession, state_dir, delta,
            keys=("user_id", "date"), batch_marker=batch_id,
        )

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


_MEM_SINK_SEQ = [0]


def run_available_now(
    df: DataFrame, output_mode: str = "complete", checkpoint_dir: str | None = None
) -> DataFrame:
    """Run a streaming DataFrame to completion over all currently-staged
    files (availableNow trigger) into a memory sink; return the sink as a
    batch DataFrame. complete mode re-emits final window states, so the
    result is directly comparable to the batch/oracle computation.

    The sink's temp view is dropped before returning: the result (window
    counts / user states — driver-memory scale by construction) is pinned
    via localCheckpoint(eager=True), so repeated bench/test runs don't
    accumulate named memory-sink tables in the session catalog. The
    checkpointed blocks are freed by the ContextCleaner once the returned
    DataFrame is garbage-collected."""
    _MEM_SINK_SEQ[0] += 1
    name = f"stream_sink_{_MEM_SINK_SEQ[0]}"
    w = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.trigger(availableNow=True).start()
    q.awaitTermination()
    spark = df.sparkSession
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out
