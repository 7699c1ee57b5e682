#!/usr/bin/env python
"""Deterministic scale-tier generator for the star-schema testdata analog.

Round-4 scale evidence (VERDICT next-round #1/#6): the driver testdata
stops at sf0.1 (17 MB), which cannot distinguish "metadata-scale at
sf0.1" from "metadata-scale, period". This generates the SAME ten tables
(schemas and value distributions profiled from /root/testdata/sf0.1 —
see docstrings per table) at an arbitrary multiple of sf0.1, so the full
catalog + bench suite can be dry-run at 100x (mult=100 -> "sf10":
lineitem 60M rows, events 10M, documents 500k) on local[32].

Design rules:
- every value is a closed form of xxhash64(id, salt): deterministic
  across runs AND across partitionings (no rand(), no driver loops);
- generation is spark.range + codegen expressions end-to-end — the
  generator itself is a distributed job that would run at 100 TB;
- ~1%% of documents are planted exact duplicates (text of doc_id-1),
  mirroring the testdata's dup plant so dedup queries stay meaningful;
- an extra `events_skew` table (90%% of rows one event_type, same
  schema/size as events) feeds the salted-join wall-time experiment —
  the driver testdata's events are uniform over 5 types, which never
  stresses reducer balance.

Usage: python tools/make_star_tier.py [--mult 100] [--out .data/star_sf10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

# the 29-word corpus vocabulary profiled from testdata sf0.1 documents
# (31 distinct tokens there: these + the rare planted 'dup' marker)
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "query", "a", "scan", "batch",
]
LANGS = ["en", "en", "zh", "es", "fr", "de"]  # en ~2x the others (profiled 41%)
ETYPES = ["signup", "purchase", "view", "click", "error"]


def _h(col: str, salt: str):
    """Deterministic non-negative 63-bit hash of (col, salt)."""
    return F.abs(F.xxhash64(F.col(col), F.lit(salt)))


def build_tables(spark, mult: int) -> dict[str, DataFrame]:
    """All ten testdata tables at `mult` x sf0.1 row counts, plus
    events_skew. Row counts at sf0.1 (profiled): customer 15k,
    supplier 1k, part 20k, orders 150k, lineitem ~600k (avg 4.075
    lines/order), events 100k over 1.5k users, documents 5k,
    embeddings 2k (64-dim, 10 labels)."""
    n_cust = 15_000 * mult
    n_supp = 1_000 * mult
    n_part = 20_000 * mult
    n_ord = 150_000 * mult
    n_events = 100_000 * mult
    n_users = 1_500 * mult
    n_docs = 5_000 * mult
    n_vecs = 2_000 * mult
    parts = max(32, mult)  # input split count for the big ranges

    region = spark.range(0, 5, 1, 1).select(
        F.col("id").cast("int").alias("r_regionkey"),
        F.element_at(
            F.array(*[F.lit(x) for x in
                      ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]]),
            F.col("id").cast("int") + 1,
        ).alias("r_name"),
    )

    nation = spark.range(0, 25, 1, 1).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )

    customer = spark.range(0, n_cust, 1, parts).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")
                 ).alias("c_name"),
        (_h("id", "cn") % 25).cast("int").alias("c_nationkey"),
        ((_h("id", "cb") % 1_000_000) / 100.0).alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(x) for x in
                      ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]]),
            (_h("id", "cm") % 5).cast("int") + 1,
        ).alias("c_mktsegment"),
    )

    supplier = spark.range(0, n_supp, 1, max(1, parts // 8)).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad(F.col("id").cast("string"), 9, "0")
                 ).alias("s_name"),
        (_h("id", "sn") % 25).cast("int").alias("s_nationkey"),
        ((_h("id", "sb") % 1_000_000) / 100.0).alias("s_acctbal"),
    )

    sizes_arr = F.array(*[F.lit(x) for x in
                          ["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO", "MEDIUM"]])
    adjs = F.array(*[F.lit(x) for x in
                     ["large", "hot", "cold", "small", "bright", "dim", "new", "old"]])
    nouns = F.array(*[F.lit(x) for x in
                      ["ring", "bolt", "gear", "cog", "pin", "rod", "cap", "nut"]])
    part = spark.range(0, n_part, 1, parts).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            F.element_at(adjs, (_h("id", "pa") % 8).cast("int") + 1), F.lit(" "),
            F.element_at(nouns, (_h("id", "pn") % 8).cast("int") + 1),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), (_h("id", "pb") % 25).cast("string")).alias("p_brand"),
        F.element_at(sizes_arr, (_h("id", "pt") % 6).cast("int") + 1).alias("p_type"),
        (_h("id", "ps") % 50 + 1).cast("int").alias("p_size"),
        (900.0 + (_h("id", "pp") % 100_000) / 100.0).alias("p_retailprice"),
    )

    # orders span 1995-01-01 .. 2001-08-01 (2404 days), status F/O ~49/49 + P rare
    orders = spark.range(0, n_ord, 1, parts).select(
        F.col("id").alias("o_orderkey"),
        (_h("id", "oc") % n_cust).alias("o_custkey"),
        F.when(_h("id", "os") % 100 < 49, F.lit("F"))
        .when(_h("id", "os") % 100 < 98, F.lit("O"))
        .otherwise(F.lit("P")).alias("o_orderstatus"),
        (900.0 + (_h("id", "ot") % 45_000_000) / 100.0).alias("o_totalprice"),
        F.expr(
            "cast(date_add(date '1995-01-01', "
            "cast(abs(xxhash64(id, 'od')) % 2404 as int)) as timestamp)"
        ).alias("o_orderdate"),
        F.element_at(
            F.array(*[F.lit(x) for x in
                      ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]]),
            (_h("id", "op") % 5).cast("int") + 1,
        ).alias("o_orderpriority"),
    )

    # lineitem: 1..7 lines per order (avg ~4, matches the profiled 4.075);
    # shipdate = orderdate + 1..95 days (profiled max lag)
    lineitem = (
        spark.range(0, n_ord, 1, parts)
        .select(
            F.col("id").alias("l_orderkey"),
            F.expr("cast(date_add(date '1995-01-01', "
                   "cast(abs(xxhash64(id, 'od')) % 2404 as int)) as timestamp)"
                   ).alias("o_orderdate"),
            F.posexplode(
                F.sequence(F.lit(1), (_h("id", "nl") % 7 + 1).cast("int"))
            ).alias("pos", "l_linenumber"),
        )
        .select(
            "l_orderkey",
            (F.abs(F.xxhash64("l_orderkey", "pos", F.lit("lp"))) % n_part
             ).alias("l_partkey"),
            (F.abs(F.xxhash64("l_orderkey", "pos", F.lit("ls"))) % n_supp
             ).alias("l_suppkey"),
            F.col("l_linenumber").cast("int"),
            (F.abs(F.xxhash64("l_orderkey", "pos", F.lit("lq"))) % 50 + 1
             ).cast("double").alias("l_quantity"),
            (900.0 + (F.abs(F.xxhash64("l_orderkey", "pos", F.lit("le"))) % 10_410_000)
             / 100.0).alias("l_extendedprice"),
            ((F.abs(F.xxhash64("l_orderkey", "pos", F.lit("ld"))) % 11) / 100.0
             ).alias("l_discount"),
            ((F.abs(F.xxhash64("l_orderkey", "pos", F.lit("lt"))) % 9) / 100.0
             ).alias("l_tax"),
            F.element_at(
                F.array(F.lit("R"), F.lit("A"), F.lit("N")),
                (F.abs(F.xxhash64("l_orderkey", "pos", F.lit("lr"))) % 3).cast("int") + 1,
            ).alias("l_returnflag"),
            F.element_at(
                F.array(F.lit("O"), F.lit("F")),
                (F.abs(F.xxhash64("l_orderkey", "pos", F.lit("ll"))) % 2).cast("int") + 1,
            ).alias("l_linestatus"),
            F.expr(
                "cast(date_add(cast(o_orderdate as date), "
                "cast(abs(xxhash64(l_orderkey, pos, 'lsd')) % 95 + 1 as int)) "
                "as timestamp)"
            ).alias("l_shipdate"),
        )
    )

    def events_df(skew: bool) -> DataFrame:
        # uniform 5 types; skew variant sends 90% of rows to 'view'
        etype_arr = F.array(*[F.lit(x) for x in ETYPES])
        if skew:
            etype = F.when(_h("id", "sk") % 10 < 9, F.lit("view")).otherwise(
                F.element_at(etype_arr, (_h("id", "et") % 5).cast("int") + 1)
            )
        else:
            etype = F.element_at(etype_arr, (_h("id", "et") % 5).cast("int") + 1)
        return spark.range(0, n_events, 1, parts).select(
            F.col("id").alias("event_id"),
            F.expr(
                "timestamp '2024-01-01 00:00:00' + make_dt_interval(0, 0, 0, "
                "  (abs(xxhash64(id, 'ts')) % 2591940) + "
                "  (abs(xxhash64(id, 'tu')) % 1000000) / 1e6)"
            ).alias("ts"),
            (_h("id", "uid") % n_users).alias("user_id"),
            etype.alias("event_type"),
            ((_h("id", "val") % 56_022) / 100.0).alias("value"),
            F.concat(F.lit('{"k": '), (_h("id", "pk") % 100).cast("string"),
                     F.lit("}")).alias("props"),
        )

    # documents: 8..105 words from the 29-word vocab; ~1% planted exact
    # duplicates (doc 100k+7 repeats the text of doc 100k+6); rare 'dup'
    # marker token mirrors the testdata plant
    doc_seed = F.when(
        (F.col("id") % 100 == 7) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    documents = (
        spark.range(0, n_docs, 1, parts)
        .select(F.col("id"), doc_seed.alias("seed"))
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        (F.abs(F.xxhash64("seed", F.lit("nw"))) % 98 + 7).cast("int"),
                    ),
                    lambda i: F.when(
                        F.abs(F.xxhash64(F.col("seed"), i, F.lit("dupw"))) % 2000 == 0,
                        F.lit("dup"),
                    ).otherwise(
                        F.element_at(
                            vocab_arr,
                            (F.abs(F.xxhash64(F.col("seed"), i, F.lit("w"))) % 29
                             ).cast("int") + 1,
                        )
                    ),
                ),
                " ",
            ).alias("text"),
            F.element_at(
                F.array(*[F.lit(x) for x in LANGS]),
                (_h("id", "lang") % 6).cast("int") + 1,
            ).alias("lang"),
            F.concat(F.lit("src"), (_h("id", "src") % 20).cast("string")).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )

    # embeddings: 64-dim float vectors clustered around 10 label centroids
    # (centroid dims and +/-0.3 noise are both hash closed forms)
    embeddings = spark.range(0, n_vecs, 1, max(1, parts // 4)).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (
                (F.abs(F.xxhash64((F.col("id") % 10), i, F.lit("ctr"))) % 2001 - 1000)
                / 1000.0
                + (F.abs(F.xxhash64(F.col("id"), i, F.lit("nz"))) % 601 - 300) / 1000.0
            ).cast("float"),
        ).alias("embedding"),
        (F.col("id") % 10).cast("int").alias("label"),
    )

    return {
        "region": region,
        "nation": nation,
        "customer": customer,
        "supplier": supplier,
        "part": part,
        "orders": orders,
        "lineitem": lineitem,
        "events": events_df(skew=False),
        "events_skew": events_df(skew=True),
        "documents": documents,
        "embeddings": embeddings,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100,
                    help="row-count multiple of sf0.1 (100 -> 'sf10')")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset to generate (default all) — "
                         "e.g. --tables embeddings for the near-dup scaling "
                         "curve, where the other ten tables would be dead "
                         "weight at mult=1000")
    args = ap.parse_args()
    out = args.out or os.path.join(REPO, ".data", f"star_sf{args.mult / 10:g}")

    from docling_nlp_api_spark.session import get_spark

    spark = get_spark("star_tier_gen", cores=args.cores, shuffle_partitions=64)
    t0 = time.time()
    tables = build_tables(spark, args.mult)
    if args.tables:
        keep = set(args.tables.split(","))
        tables = {n: df for n, df in tables.items() if n in keep}
    for name, df in tables.items():
        t = time.time()
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {time.time() - t:.1f}s", flush=True)
    print(f"DONE {out} in {time.time() - t0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
