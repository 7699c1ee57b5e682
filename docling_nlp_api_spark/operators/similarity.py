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
    return (
        emb.select(_bucket_expr().alias("bucket"))
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


def _sq_dist_expr(vec_col: str, centroid: list[float]) -> str:
    """Squared L2 distance of `vec_col` (array<float>) to a literal
    centroid, as a codegen-able SQL expression."""
    lit = "array(" + ",".join(f"CAST({v} AS DOUBLE)" for v in centroid) + ")"
    return (
        f"aggregate(zip_with({vec_col}, {lit}, (x, y) -> (CAST(x AS DOUBLE) - y) "
        f"* (CAST(x AS DOUBLE) - y)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _dist_pairs(centroids: list[list[float]]):
    pairs = F.array(
        *[
            F.struct(F.expr(_sq_dist_expr("embedding", c)).alias("d"), F.lit(j).alias("j"))
            for j, c in enumerate(centroids)
        ]
    )
    return pairs


def _assign_col(centroids: list[list[float]]):
    """argmin cluster id via array_min over (distance, id) structs — ties
    pinned by cluster id, matching the oracle's (d, j) ordering."""
    return F.array_min(_dist_pairs(centroids))["j"]


def _probe_list_col(centroids: list[list[float]], nprobe: int):
    """The ``nprobe`` nearest cluster ids, nearest first. Struct
    array_sort orders by (d, j) — identical tie rule to ``_assign_col``
    (nprobe=1 probes exactly the assigned cluster). All k distances are
    computed either way; keeping top-n instead of the min is free."""
    return F.transform(
        F.slice(F.array_sort(_dist_pairs(centroids)), 1, nprobe), lambda x: x["j"]
    )


def kmeans_fit(emb: DataFrame, n_clusters: int = 8, iters: int = 2) -> list[list[float]]:
    """Deterministic Lloyd's k-means over the embedding column, the IVF
    coarse quantizer. Init = embeddings of the n_clusters smallest
    vec_ids; each iteration assigns via a codegen argmin expression and
    recomputes means with ONE posexplode aggregation (k x dim rows
    collected to the driver — the centroid table is tiny by construction,
    the corpus never leaves executors). Centroids are rounded to 6
    decimals each iteration: that is the cross-engine contract that makes
    the quantizer bit-reproducible in the DuckDB oracle (averaging order
    differs between engines; 1e-13 float drift would otherwise cascade
    through assignments)."""
    first = emb.orderBy("vec_id").limit(n_clusters).select("vec_id", "embedding").collect()
    cents = [[round(float(x), 6) for x in r["embedding"]] for r in first]
    for _ in range(iters):
        assigned = emb.select(_assign_col(cents).alias("cl"), "embedding")
        means = (
            assigned.select("cl", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cl", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]  # clusters that lost all members keep position
        by_cl: dict[int, dict[int, float]] = {}
        for r in means:
            by_cl.setdefault(r["cl"], {})[r["pos"]] = r["m"]
        for cl, dims in by_cl.items():
            new[cl] = [round(dims[p], 6) for p in range(len(dims))]
        cents = new
    return cents


def ivf_kmeans_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    n_clusters: int = 8,
    iters: int = 2,
    query_mod: int = 100,
    nprobe: int = 1,
) -> DataFrame:
    """IVF with a LEARNED coarse quantizer (vs ivf_topk's pre-existing
    label): fit k-means, assign corpus + queries, probe the query's
    ``nprobe`` nearest clusters, exact cosine rank inside the probed
    shards. The candidate join is an equi-join on the learned cluster id
    — at 100 TB the quantizer fit runs on a sample and the assignment is
    one codegen-able map pass; no stage touches more than the probed
    shards. nprobe>1 recovers boundary-query recall (see
    tests/test_new_operators.py::test_ivf_nprobe2_recovers_boundary_recall)
    at a linear-in-nprobe
    candidate cost — still a bucket equi-join, never a cross join."""
    return ivf_kmeans_topk_df(
        load_embeddings(spark, sf_dir), k=k, n_clusters=n_clusters, iters=iters,
        query_mod=query_mod, nprobe=nprobe,
    )


def ivf_kmeans_topk_df(
    emb: DataFrame,
    k: int = 3,
    n_clusters: int = 8,
    iters: int = 2,
    query_mod: int = 100,
    nprobe: int = 1,
) -> DataFrame:
    """DataFrame-input form of ivf_kmeans_topk (fit + assign + probe).

    Queries explode into one row per probed cluster (a candidate lives in
    exactly one cluster, so (query_id, cand_id) pairs stay unique without
    a dedup pass); candidates keep their single argmin assignment."""
    from pyspark.sql import Window

    cents = kmeans_fit(emb, n_clusters=n_clusters, iters=iters)
    asg = emb.select("vec_id", "embedding", _assign_col(cents).alias("cl"))
    q = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.explode(_probe_list_col(cents, nprobe)).alias("ql"),
    )
    c = asg.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"), F.col("cl").alias("cl"))
    pairs = F.broadcast(q).join(c, F.col("ql") == F.col("cl")).filter(
        F.col("query_id") != F.col("cand_id")
    )
    cos = F.expr(
        f"{DOT.format(a='qe', b='ce')} / ({NORM.format(a='qe')} * {NORM.format(a='ce')})"
    )
    scored = pairs.select("query_id", "cand_id", F.round(cos, 4).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def _bucket_expr(col: str = "embedding") -> F.Column:
    """The 8-sign-bit hyperplane bucket id as a column expression —
    shared by lsh_bucket_histogram and the multi-probe path."""
    bucket = None
    for p, plane in enumerate(hyperplanes()):
        lit = "array(" + ",".join(f"CAST({v} AS DOUBLE)" for v in plane) + ")"
        bit = (
            F.when(F.expr(DOT.format(a=col, b=lit)) > 0, F.lit(1 << p))
            .otherwise(F.lit(0))
        )
        bucket = bit if bucket is None else bucket + bit
    return bucket


def lsh_multiprobe_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    query_mod: int = 100,
    probe_bits: int = N_PLANES,
) -> DataFrame:
    """Multi-probe hyperplane LSH top-k (Lv et al. 2007, public): each
    query probes its own bucket PLUS the probe_bits Hamming-1 neighbor
    buckets (flip one sign bit at a time) — the standard trick to recover
    recall lost to boundary queries without adding hash tables.
    probe_bits=0 degrades to exact-bucket LSH (the recall baseline the
    pytest compares against).

    Scale shape: the probe fan-out multiplies only the QUERY side
    (|queries| × (probe_bits+1) rows of (query_id, bucket)); candidates
    come from an equi-join on bucket against the corpus bucket column —
    never a cross join — and each (query, cand) pair arises at most once
    because a vector lives in exactly one bucket and the probe list is
    distinct. Ranking is a per-query row_number window (per-query state,
    no global sort); round-4 cosine + cand_id tiebreak is the
    cross-engine contract shared with the other ANN entries."""
    from pyspark.sql import Window

    emb = load_embeddings(spark, sf_dir)
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("ce"),
        _bucket_expr().alias("bucket"),
    )
    qs = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _bucket_expr().alias("qb"),
    )
    probes = qs.select(
        "query_id",
        "qe",
        F.explode(
            F.array(F.col("qb"), *[F.expr(f"qb ^ {1 << p}") for p in range(probe_bits)])
        ).alias("bucket"),
    )
    cos = F.expr(
        f"{DOT.format(a='qe', b='ce')} / ({NORM.format(a='qe')} * {NORM.format(a='ce')})"
    )
    scored = (
        probes.join(c, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", F.round(cos, 4).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
