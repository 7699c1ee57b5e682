"""Link-graph quality signals: fixed-iteration PageRank over a document
link graph (Page et al. 1999, public) — the classic web-scale curation
weight (seed-quality / crawl-priority signal in training-data pipelines).

The corpus fixture has no link column, so the catalog entry synthesizes
a deterministic graph from doc_ids (each doc links to 3 modular targets);
`pagerank` itself takes any (src, dst) edge frame.

Cross-engine determinism: floating-point PageRank is summation-order-
dependent, so a distributed sum and DuckDB's serial sum can round
differently. The iteration here runs in FIXED-POINT integer arithmetic:
ranks are stored as rank × n × PR_NODE_SCALE, i.e. the uniform
distribution is exactly PR_NODE_SCALE (1e6) per node regardless of n —
no per-node underflow at any corpus size, and no n-dependent constant,
so the operator never needs a count() of the node set. Overflow safety
at 10^12 docs: total mass stays ~n × 1e6 ≤ 9.2e18 (int64 max) up to
n ≈ 9×10^12, and the damping step uses the split form
(s div 100) × 85 + ((s mod 100) × 85) div 100 — algebraically equal to
(85 × s) div 100 for s = 100q + r — so no intermediate ever exceeds
0.85 × s even when one hub receives the entire corpus mass. Dangling
mass is dropped identically in both engines (ranks are a quality
ordering, not a strict probability distribution).

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

PR_NODE_SCALE = 1_000_000  # fixed point: uniform rank == 1e6 per node
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85 as an exact ratio
PR_BASE = PR_NODE_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN  # teleport mass
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
    if mod is None:  # empty corpus -> empty graph, not a null-literal plan
        return nodes.select(
            F.col("doc_id").alias("src"), F.col("doc_id").alias("dst")
        )
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


def _damp(s: F.Column | str) -> F.Column:
    """(85 * s) div 100 computed as the overflow-safe split form — no
    intermediate exceeds 0.85 * s (see module docstring)."""
    return F.expr(
        f"({s} div {PR_DAMP_DEN}) * {PR_DAMP_NUM}"
        f" + ((pmod({s}, {PR_DAMP_DEN})) * {PR_DAMP_NUM}) div {PR_DAMP_DEN}"
    )


def pagerank(nodes: DataFrame, edges: DataFrame, iterations: int = PR_ITERATIONS) -> DataFrame:
    """Fixed-point PageRank: pr' = (1-d)*uniform + d * Σ_in pr(src) div
    out(src), in per-node scaled integers (uniform == PR_NODE_SCALE, see
    module docstring — no count() of the node set is ever taken). Returns
    the top PR_TOP_K docs as (doc_id, pr_fixed) with the (pr desc,
    doc_id) deterministic tiebreak — a TakeOrderedAndProject, never a
    global sort."""
    outdeg = edges.groupBy("src").agg(F.count("*").alias("od"))
    ranks = nodes.select("doc_id", F.lit(PR_NODE_SCALE).cast("long").alias("pr"))
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
                (F.lit(PR_BASE) + _damp("coalesce(s, 0L)")).cast("long").alias("pr"),
            )
        )
    return (
        ranks.orderBy(F.col("pr").desc(), "doc_id")
        .limit(PR_TOP_K)
        .select("doc_id", F.col("pr").alias("pr_fixed"))
    )
