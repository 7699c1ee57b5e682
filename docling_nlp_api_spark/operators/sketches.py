"""Sketch plane: deterministic HyperLogLog cardinality estimation
(Flajolet et al. 2007, public) built from md5 so the whole sketch —
registers AND estimate — is bit-identical across engines and therefore
EXACTLY oracle-checkable (Spark's own approx_count_distinct uses a
private hash and cannot be cross-verified value-for-value).

Register model (b = 8, m = 256):
    h       = first 15 hex chars of md5(value)  -> 60-bit integer
    bucket  = top 8 bits (h >> 52)
    w       = low 52 bits
    rank    = leading zeros of w within 52 bits + 1
            = 53 - length(bin(w))       (w > 0; bin() drops leading 0s)
            = 53                        (w = 0)
    M[j]    = max rank per bucket

Exactness contract: the harmonic denominator sum(2^-M[j]) is computed
in INTEGER space as sum(1 << (53 - M[j])) / 2^53 — every term is an
exact int64, integer addition is order-free, so Spark's nondeterministic
partial-agg order and DuckDB produce identical doubles (a plain double
sum of 2^-M terms spans >53 mantissa bits and is order-dependent — the
naive formulation is a latent oracle flake).

Scale shape: the sketch IS the aggregation — per group only m register
rows (max-merged map-side) cross the exchange regardless of input size,
and register tables from different snapshots/partitions union-merge via
max(rank), which the merge pytest pins against a direct estimate."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_B = 8
HLL_M = 1 << HLL_B          # 256 registers
_W_BITS = 60 - HLL_B        # 52-bit rank window
# alpha_256 per the HLL paper's alpha_m = 0.7213 / (1 + 1.079/m)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _h60(col: Column) -> Column:
    """First 60 md5 bits as a non-negative long (15 hex chars < 2^63)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def hll_registers(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, bucket, rank) register table — the mergeable sketch state."""
    h = _h60(F.col(value_col))
    bucket = F.shiftright(h, _W_BITS)
    w = h.bitwiseAND(F.lit((1 << _W_BITS) - 1))
    staged = df.select(
        F.col(group_col).alias("grp"),
        bucket.alias("bucket"),
        w.alias("w"),
    )
    rank = F.when(F.col("w") == 0, F.lit(_W_BITS + 1)).otherwise(
        F.lit(_W_BITS + 1) - F.length(F.expr("bin(w)"))
    )
    return (
        staged.select("grp", "bucket", rank.alias("rank"))
        .groupBy("grp", "bucket")
        .agg(F.max("rank").alias("rank"))
    )


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """Estimate per group from a register table (raw HLL + the paper's
    linear-counting small-range correction), plus the exact-integer
    harmonic sum described in the module docstring."""
    m, alpha = HLL_M, HLL_ALPHA
    agg = regs.groupBy("grp").agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_W_BITS + 1} - rank)"))
        .alias("hsum_int"),
        F.count("*").alias("n_present"),
    )
    denom = F.col("hsum_int") / F.lit(float(1 << (_W_BITS + 1))) + (m - F.col("n_present"))
    raw = F.lit(alpha * m * m) / denom
    zeros = F.lit(m) - F.col("n_present")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select("grp", F.round(est, 4).alias("hll_estimate"))


def hll_distinct(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group deterministic-HLL distinct estimate next to the exact
    count and the relative error (the accuracy self-report; expected
    ~1.04/sqrt(256) = 6.5% RMS)."""
    regs = hll_registers(df, group_col, value_col)
    est = hll_estimate_from_registers(regs)
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count_distinct(value_col).alias("exact_distinct")
    )
    return (
        exact.join(est, "grp")
        .select(
            F.col("grp").alias(group_col),
            "exact_distinct",
            "hll_estimate",
            F.round(
                F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
    )


CMS_W = 1024   # counters per row
CMS_D = 3      # hash rows (universal family rows 0..2, shared with dedup)


def cms_word_counts(docs: DataFrame, top_n: int = 20,
                    w: int = CMS_W, d: int = CMS_D) -> DataFrame:
    """CountMin frequency sketch (Cormode & Muthukrishnan 2005, public)
    over the corpus word stream, reported against exact counts for the
    top-n words: estimate = min over d rows of counter[(A_i*h+B_i) mod P
    mod w], h = first 32 md5 bits of the word — the same pinned
    universal family the dedup/bloom planes use, so the whole sketch is
    cross-engine deterministic and the oracle checks the OVERESTIMATES
    bit-for-bit (CMS never undercounts; `over` is the collision noise).

    Scale shape: counters are built from the vocabulary-sized word-count
    rollup (weighted by count), never the raw token stream, so the
    sketch stage shuffles <= d*w integer rows total; the top-n probe is
    a broadcast join of 20 rows against the <= d*w-row sketch. Sketches
    from different shards merge by elementwise ADD of counters (the
    linearity property), mirrored by the merge pytest."""
    from .dedup import MH_P, mh_constants

    a, b = mh_constants(d)
    words = (
        docs.select(F.explode(F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z0-9]+"), 0)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    h = F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
    hashed = words.select("word", "cnt", h.alias("h"))
    rows = []
    for i in range(d):
        idx = ((F.lit(a[i]) * F.col("h") + F.lit(b[i])) % F.lit(MH_P)) % F.lit(w)
        rows.append(hashed.select(F.lit(i).alias("r"), idx.alias("idx"), "cnt", "word"))
    flat = rows[0]
    for r in rows[1:]:
        flat = flat.unionByName(r)
    sketch = flat.groupBy("r", "idx").agg(F.sum("cnt").alias("c"))
    top = hashed.orderBy(F.desc("cnt"), "word").limit(top_n)
    probes = None
    for i in range(d):
        idx = ((F.lit(a[i]) * F.col("h") + F.lit(b[i])) % F.lit(MH_P)) % F.lit(w)
        p = top.select("word", "cnt", F.lit(i).alias("r"), idx.alias("idx"))
        probes = p if probes is None else probes.unionByName(p)
    est = (
        probes.join(F.broadcast(sketch), ["r", "idx"])
        .groupBy("word")
        .agg(F.first("cnt").alias("exact_cnt"), F.min("c").alias("cms_est"))
    )
    return est.select(
        "word",
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("over"),
    )


WAU_WINDOW_DAYS = 7


def rolling_wau(events: DataFrame, window_days: int = WAU_WINDOW_DAYS) -> DataFrame:
    """Rolling N-day active users from MERGED daily HLL registers — the
    mergeability payoff: sliding-window COUNT DISTINCT is the classic op
    that doesn't decompose (distinct isn't subtractable, so a window
    function can't slide it), but register tables ADD by max, so each
    day's WAU = max-merge of the trailing window's daily sketches.
    Emits (date, wau_exact, wau_hll, rel_err) — the exact column is the
    verifier, computed here because the fixture is small; at 10^12
    events only the sketch path runs.

    Scale shape: daily registers are the ONLY corpus-wide aggregation
    (m=256 rows/day regardless of volume); the trailing-window merge is
    a range join of the calendar spine against the register table —
    days × window × m rows, metadata-sized. The exact verifier dedups
    (user, day) pairs first so even it never range-joins raw events."""
    day = F.to_date("ts").alias("date")
    regs = hll_registers(events.select(day, "user_id"), "date", "user_id")
    # dense calendar spine: a zero-event day still has a well-defined
    # trailing-window WAU (the users of the preceding days), so it must
    # emit a row rather than silently vanish
    spine = events.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    ).select(F.explode(F.sequence("lo", "hi")).alias("d"))

    # trailing-window register merge: spine day d absorbs days (d-w, d]
    merged = (
        spine.join(
            regs,
            (F.col("grp") > F.date_sub(F.col("d"), window_days))
            & (F.col("grp") <= F.col("d")),
        )
        .groupBy(F.col("d"), "bucket")
        .agg(F.max("rank").alias("rank"))
        .select(F.col("d").alias("grp"), "bucket", "rank")
    )
    est = hll_estimate_from_registers(merged)

    pairs = events.select(day, "user_id").distinct()
    exact = (
        spine.join(
            pairs,
            (F.col("date") > F.date_sub(F.col("d"), window_days))
            & (F.col("date") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("wau_exact"))
    )
    # left joins + zero-fill: a window with no activity at all has
    # WAU 0/0.0 and NULL rel_err (no denominator), not a missing row
    return (
        spine.join(exact, "d", "left")
        .join(est, spine.d == est.grp, "left")
        .select(
            F.col("d").alias("date"),
            F.coalesce("wau_exact", F.lit(0)).cast("long").alias("wau_exact"),
            F.coalesce("hll_estimate", F.lit(0.0)).alias("wau_hll"),
            F.when(
                F.coalesce("wau_exact", F.lit(0)) > 0,
                F.round(
                    F.abs(F.coalesce("hll_estimate", F.lit(0.0)) - F.col("wau_exact"))
                    / F.col("wau_exact"),
                    4,
                ),
            ).alias("rel_err"),
        )
    )
