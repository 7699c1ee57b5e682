"""Link-graph quality signals: fixed-iteration PageRank over a document
link graph (Page et al. 1999, public) — the classic web-scale curation
weight (seed-quality / crawl-priority signal in training-data pipelines).

The corpus fixture has no link column, so the catalog entry synthesizes
a deterministic graph from doc_ids (each doc links to 3 modular targets);
`pagerank` itself takes any (src, dst) edge frame.

Cross-engine determinism: floating-point PageRank is summation-order-
dependent, so a distributed sum and DuckDB's serial sum can round
differently. The iteration here runs in FIXED-POINT integer arithmetic
(rank × 1e9 as BIGINT, integer division throughout): bit-exact,
order-independent, and overflow-safe (total mass ≤ 1e9 × n ≪ 2^63).
Dangling mass is dropped identically in both engines (ranks are a
quality ordering, not a strict probability distribution).

Scale shape: per iteration one equi-join of the rank table onto the edge
set on `src` followed by one groupBy(dst) — both shuffle on graph keys
only (8 bytes + a rank long per edge; the corpus text never enters).
At 10^12 docs the edge set dwarfs the rank table, so the physical win is
partitioning edges ONCE by src and reusing that partitioning across all
iterations (repartition + persist at the caller); AQE handles hub skew
via skew-join splitting. Iteration count is fixed (a literal plan), so
the whole computation is one Catalyst DAG — no driver-side convergence
collect on the data plane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000  # fixed-point: rank × 1e9 as BIGINT
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85 as an exact ratio
PR_ITERATIONS = 3
PR_TOP_K = 20
PR_FANOUT = 3  # synthetic graph: links per doc


def synth_edges(docs: DataFrame) -> DataFrame:
    """Deterministic link graph over the fixture corpus: doc i links to
    (i*31 + c*7) mod (max_id+1) for c in 1..PR_FANOUT, keeping only
    targets that exist and dropping self-loops/duplicates. Mirrored
    verbatim in the SQL oracle."""
    nodes = docs.select("doc_id")
    mod = docs.agg((F.max("doc_id") + 1).alias("m")).collect()[0].m  # metadata scalar
    fan = F.explode(F.array(*[F.lit(c) for c in range(1, PR_FANOUT + 1)])).alias("c")
    raw = nodes.select(F.col("doc_id").alias("src"), fan).select(
        "src", ((F.col("src") * 31 + F.col("c") * 7) % F.lit(mod)).alias("dst")
    )
    return (
        raw.filter(F.col("dst") != F.col("src"))
        .join(nodes.select(F.col("doc_id").alias("dst")), "dst")
        .select("src", "dst")
        .distinct()
    )


def pagerank(nodes: DataFrame, edges: DataFrame, iterations: int = PR_ITERATIONS) -> DataFrame:
    """Fixed-point PageRank: pr' = (1-d)/n + d * Σ_in pr(src) div out(src),
    all in scaled integers (see module docstring). Returns the top
    PR_TOP_K docs as (doc_id, pr_fixed) with the (pr desc, doc_id)
    deterministic tiebreak — a TakeOrderedAndProject, never a global sort."""
    n = nodes.count()  # metadata scalar (one long), not a data collect
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN) // n
    outdeg = edges.groupBy("src").agg(F.count("*").alias("od"))
    ranks = nodes.select("doc_id", F.lit(PR_SCALE // n).cast("long").alias("pr"))
    for _ in range(iterations):
        contrib = (
            edges.join(ranks.withColumnRenamed("doc_id", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("pr div od").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.lit(base)
                    + F.expr(f"({PR_DAMP_NUM} * coalesce(s, 0L)) div {PR_DAMP_DEN}")
                ).cast("long").alias("pr"),
            )
        )
    return (
        ranks.orderBy(F.col("pr").desc(), "doc_id")
        .limit(PR_TOP_K)
        .select("doc_id", F.col("pr").alias("pr_fixed"))
    )
