"""Similarity search over the embeddings table (array<float>, dim=64) —
brute-force cosine top-k baseline + LSH/IVF scale paths (driver brief).

Dot products run as built-in `aggregate(zip_with(...))` in codegen —
no Python. Hyperplanes for LSH are md5-derived literal constants shared
verbatim with the SQL oracle (catalog.py) so both engines compute the
same buckets.

Scale notes: brute-force is the per-query-exact baseline (broadcast the
query set, never the corpus). The LSH path turns ANN into a bucket
groupBy; IVF uses the coarse `label` cluster as the probe list, so the
candidate join is an equi-join on the cluster id, not a cross join."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 8


def _hexint(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def hyperplanes(n: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]."""
    return [
        [((_hexint(f"{p}:{d}") % 2001) - 1000) / 1000.0 for d in range(dim)]
        for p in range(n)
    ]


DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)
NORM = "sqrt(aggregate({a}, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def brute_force_topk(spark: SparkSession, sf_dir: str, k: int = 5, query_mod: int = 100) -> DataFrame:
    """Exact cosine top-k: queries (vec_id % query_mod == 0) vs the corpus.
    The small query side is broadcast; rank ties pinned by neighbor id."""
    from pyspark.sql import Window

    emb = load_embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"))
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("cand_id"))
    cos = F.expr(
        f"{DOT.format(a='qe', b='ce')} / ({NORM.format(a='qe')} * {NORM.format(a='ce')})"
    )
    scored = pairs.select("query_id", "cand_id", F.round(cos, 4).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 8 sign bits -> bucket id; bucket histogram.
    At scale, ANN = equi-join on bucket instead of a cross join."""
    emb = load_embeddings(spark, sf_dir)
    planes = hyperplanes()
    bucket = None
    for p, plane in enumerate(planes):
        lit = "array(" + ",".join(f"CAST({v} AS DOUBLE)" for v in plane) + ")"
        bit = F.when(F.expr(DOT.format(a="embedding", b=lit)) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return (
        emb.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )


def ivf_topk(spark: SparkSession, sf_dir: str, k: int = 3, query_mod: int = 100) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse cluster (`label`) —
    the candidate join is an equi-join on the cluster id."""
    from pyspark.sql import Window

    emb = load_embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), F.col("label").alias("ql")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"), F.col("label").alias("cl"))
    pairs = F.broadcast(q).join(c, F.col("ql") == F.col("cl")).filter(F.col("query_id") != F.col("cand_id"))
    cos = F.expr(
        f"{DOT.format(a='qe', b='ce')} / ({NORM.format(a='qe')} * {NORM.format(a='ce')})"
    )
    scored = pairs.select("query_id", "cand_id", F.round(cos, 4).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
