"""Generic relational operators over the TPC-H-ish star schema — the
join/filter/aggregate surface (SURVEY.md §2.2-2.4, J5, F2) exercised at
benchmark scale.

Scale notes: dimension tables (region/nation/customer at 1:15k of lineitem)
are broadcast; fact-fact joins shuffle on their natural keys with AQE skew
handling enabled (session.py). Aggregations rely on partial aggregation;
no global sorts."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical partial-agg benchmark query."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.
    Dims broadcast; the two fact joins shuffle on orderkey/custkey."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def orders_with_big_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: orders having >=1 large-quantity line (EXISTS)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    o = t(spark, sf_dir, "orders")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti (NOT EXISTS) — same primitive as checkpoint resume.
    Anti-joins against big orders (>300k) so the result is non-trivial."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("acctbal_sum"))
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered 3-way join + revenue top-10.
    Ties pinned by l_orderkey ASC so the top-k is deterministic. The
    ORDER BY ... LIMIT compiles to TakeOrderedAndProject (per-partition
    heap + driver merge of 10 rows), never a global sort."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-06-18")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-06-18")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                 "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — the predicate-pushdown
    showcase (all three filters reach the parquet scan, two columns read)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top-20."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    c = t(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
             F.count("*").alias("n_items"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + two-level agg (brand x type)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
    )


def size_guard_filter(spark: SparkSession, sf_dir: str, max_chars: int = 400) -> DataFrame:
    """F2: max-size predicate (upload<=50MB analog) over documents;
    rejects counted per lang (quarantine, not exception)."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(F.when(F.col("n_chars") <= max_chars, 1).otherwise(0)).alias("accepted"),
        F.sum(F.when(F.col("n_chars") > max_chars, 1).otherwise(0)).alias("rejected"),
    )


# salted skew-join constants — shared verbatim with the SQL oracle
SKEW_SALT_K = 16
EVENT_DIM_WEIGHTS = {
    "click": 1.0, "error": 0.0, "purchase": 5.0, "signup": 2.0, "view": 0.5,
}


def salted_skew_join_rollup(events: DataFrame, k: int = SKEW_SALT_K) -> DataFrame:
    """The explicit SALTING pattern for skewed join keys (driver brief:
    'salting for skew'), demonstrated on the worst case the fixture has:
    event_type holds 5 distinct values, so a plain shuffle join on it
    puts the entire fact table through at most 5 reducer keys. Salting
    replicates the dimension side k times (one row per salt) and tags
    each fact row with salt = pmod(xxhash64(event_id), k); the join key
    becomes (event_type, salt) — 5×k reducer keys, k-way parallelism per
    hot key — and every fact row still matches exactly ONE dim row, so
    the result is provably identical to the unsalted join (the oracle IS
    the unsalted SQL).

    The join is hinted to SortMergeJoin deliberately: with a 5-row dim
    Spark would broadcast and the salt would be moot — the hint models
    the production case this pattern exists for (a dim too big to
    broadcast joined on a skewed key; dim×k replication is the standard
    fix, AQE skew-split being the runtime alternative the session also
    enables). Weighted-sum rollup rounds to 4 (cross-engine float
    contract; partial aggregation makes the per-key sums order-stable
    enough at round-4)."""
    spark = events.sparkSession
    dim = spark.createDataFrame(
        [
            (t, w, s)
            for t, w in sorted(EVENT_DIM_WEIGHTS.items())
            for s in range(k)
        ],
        "event_type string, weight double, salt int",
    )
    fact = events.select(
        "event_type",
        "value",
        F.pmod(F.xxhash64("event_id"), F.lit(k)).cast("int").alias("salt"),
    )
    j = fact.join(dim.hint("merge"), ["event_type", "salt"])
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value") * F.col("weight")), 4).alias("weighted_value"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_col: str = "event_id",
    payload: tuple[str, ...] = ("event_id", "ts", "value"),
    prefix: str = "matched_",
) -> DataFrame:
    """Generic AS-OF join: for every left row, attach the LATEST right
    row with the same `key` whose `ts` is at-or-before the left row's
    `ts` (the time-series lookup join — 'state as of this moment' — that
    equality joins can't express and a naive theta-join turns into a
    per-key quadratic).

    Tie contract (pinned so a SQL engine can replay it exactly): a right
    row at the SAME timestamp as the left row matches (<=, not <); among
    right rows sharing a timestamp the one with the greatest `order_col`
    wins — i.e. the match is max by (ts, order_col).

    Scale shape — the union-tag trick, NOT a join: both sides are
    unioned with a side tag (right=0, left=1) into one stream, ONE hash
    exchange on `key`, and a running last-non-null window over
    (ts, tag, order_col) carries each right row's payload struct forward
    to every later left row. Zero join operators in the plan, no
    per-key quadratic, no range predicate: cost is exactly one shuffle +
    one sort, both partitioned by `key` (parallel across keys; a skewed
    key degrades to that key's sort, never a cross product). This is the
    shape Pandas merge_asof / kdb aj achieve single-node, expressed as a
    distributed plan. The right payload crosses the exchange as a struct
    column on right rows only; left rows carry NULL there.

    NULL contract (SQL semantics, NOT window semantics): an equi-join
    predicate never matches NULLs, but a window PARTITIONS NULL keys
    together and sorts NULL ts FIRST — so without a guard a NULL-key or
    NULL-ts right row would be carried forward as a phantom match. The
    right side therefore drops NULL key/ts rows up front (they are
    unmatchable under `r.key = l.key AND r.ts <= l.ts`). Left rows with
    NULL key/ts need no filter: after the right-side drop their
    partition position has no preceding right row (NULL ts sorts before
    every real right ts; a NULL-key partition contains no right rows),
    so they emit NULL match columns — exactly the SQL left-join result.
    """
    right = right.filter(F.col(key).isNotNull() & F.col(ts).isNotNull())
    rtypes = dict(right.dtypes)
    r_struct = F.struct(*[F.col(c).alias(c) for c in payload])
    # a genuinely NULL struct (NOT a struct of NULL fields — last(...,
    # ignorenulls) must skip left rows, and a struct-of-nulls is non-NULL)
    null_struct = F.when(
        F.lit(False),
        F.struct(*[F.lit(None).cast(rtypes[c]).alias(c) for c in payload]),
    )
    lf = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.col(order_col).alias("_o"),
        F.struct(*left.columns).alias("_l"),
        null_struct.alias("_r"),
    )
    rf = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(order_col).alias("_o"),
        F.lit(None).cast(lf.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag", "_o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lf.unionByName(rf)
        .select("_tag", "_l", F.last("_r", ignorenulls=True).over(w).alias("_m"))
        .filter(F.col("_tag") == 1)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload]
    return matched.select(*out_cols)


def asof_view_before_purchase(events: DataFrame) -> DataFrame:
    """Purchase attribution via as-of join: for each purchase event, the
    user's most recent 'view' at-or-before it — the 'view that led to
    the purchase'. Emits the purchase id/user, the matched view id, its
    round-2 value, and the view->purchase lag in exact integer
    microseconds (the repo's cross-engine time contract; differences
    cancel any engine epoch-offset convention). Purchases with no prior
    view emit NULL match columns (left semantics)."""
    p = events.filter(F.col("event_type") == "purchase")
    v = events.filter(F.col("event_type") == "view")
    j = asof_join(
        p, v, key="user_id", ts="ts", order_col="event_id",
        payload=("event_id", "ts", "value"), prefix="view_",
    )
    return j.select(
        "event_id",
        "user_id",
        F.col("view_event_id"),
        F.round("view_value", 2).alias("view_value"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("view_ts").cast("timestamp"))
        ).alias("lag_us"),
    )


RANGE_WINDOW_US = 60_000_000  # +/- 60 s, exact integer microseconds


def range_join_nearby(
    events: DataFrame, window_us: int = RANGE_WINDOW_US
) -> DataFrame:
    """Pure RANGE join (no equi key): for every 'error' event, count and
    value-sum ALL events (any user) within +/- window_us of it — the
    burst-correlation question ('what else was happening around each
    error') whose naive plan is a BroadcastNestedLoopJoin over the full
    inequality predicate: quadratic, the canonical scale-killer.

    Scale shape — BUCKETIZATION turns the range predicate into an
    equi-join: every event lands in ONE time bucket of width =
    window_us; every probe (error) row explodes to THREE buckets
    (b-1, b, b+1), which provably cover the +/- window; the join is then
    a plain hash equi-join on bucket with the exact |dt| <= window
    predicate left as a residual filter. Each qualifying pair is found
    exactly once (the build row lives in one bucket). Cost: 3x probe
    replication + one hash exchange on bucket — linear, AQE-splittable
    if a bucket is hot, and the same plan shape at any scale. The self
    row is excluded by event_id.

    Errors with no neighbor survive with n_nearby=0 (left semantics via
    re-join on the probe side)."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = F.floor(us / F.lit(window_us)).cast("long")
    probes = events.filter(F.col("event_type") == "error").select(
        "event_id", us.alias("t"), b.alias("_b")
    )
    fanned = probes.select(
        "event_id",
        "t",
        F.explode(
            F.array(F.col("_b") - 1, F.col("_b"), F.col("_b") + 1)
        ).alias("bucket"),
    )
    build = events.select(
        F.col("event_id").alias("v_id"),
        us.alias("v_t"),
        "value",
        b.alias("bucket"),
    )
    # LEFT outer with the range + self-exclusion folded into the join
    # condition: unmatched fan-out rows emit NULL v_id, so count(v_id)
    # yields 0 for isolated errors with no second join-back shuffle.
    cond = (
        (fanned["bucket"] == build["bucket"])
        & (F.abs(build["v_t"] - fanned["t"]) <= window_us)
        & (build["v_id"] != fanned["event_id"])
    )
    return (
        fanned.join(build, cond, "left")
        .groupBy(fanned["event_id"])
        .agg(
            F.count("v_id").cast("long").alias("n_nearby"),
            F.round(F.sum("value"), 2).alias("nearby_value"),
        )
    )
