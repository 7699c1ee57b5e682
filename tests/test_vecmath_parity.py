"""Arrow-scorer <-> SQL-scorer parity for the embedding family.

vecmath.py (round 4) replaces the interpreted aggregate/zip_with hot
loops with Arrow-batch NumPy kernels. The cross-engine contract is the
ROUND(x, 4) quantization, so the two scorers must agree EXACTLY on every
emitted row — these tests pin that on the real sf tables, row-for-row,
including bucket ids (sign bits), kmeans assignments/probe lists
(tie rule: first minimum), and final cosines. A planted-vector check
guards against shared-wrong-logic: the analytic cosine of a known pair
is asserted against both scorers.
"""

from __future__ import annotations

import math
import os

import pytest

from docling_nlp_api_spark.operators import similarity as S


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _all_tiers(monkeypatch, build, tiers=("sql", "pair", "kernel")):
    out = {}
    for tier in tiers:
        monkeypatch.setenv("SPARK_GRAFT_ANN_SCORER", tier)
        out[tier] = _rows(build())
    return out


@pytest.mark.parametrize(
    "fn,kw",
    [
        (S.brute_force_topk, {}),
        (S.ivf_topk, {}),
        (S.lsh_bucket_histogram, {}),
        (S.lsh_multiprobe_topk, {}),
        (S.ivf_kmeans_topk, {"nprobe": 2}),
    ],
)
def test_scorers_agree_row_for_row(spark, sf_dir, monkeypatch, fn, kw):
    got = _all_tiers(monkeypatch, lambda: fn(spark, sf_dir, **kw))
    assert got["sql"] == got["pair"] == got["kernel"]
    assert len(got["sql"]) > 0


def test_scorers_agree_embedding_near_dup(spark, sf_dir, monkeypatch):
    from docling_nlp_api_spark.operators.dedup import embedding_near_dup

    # near-dup is a banded self-join with three distinct scoring paths:
    # sql = interpreted zip_with fold over the pair join, pair = the
    # einsum pair_dot over the same join, kernel = gram_pairs_kernel
    # (applyInPandas gram matmul per bucket group — a different code
    # path entirely). All three must emit the identical pair set.
    got = _all_tiers(monkeypatch, lambda: embedding_near_dup(spark, sf_dir))
    assert got["sql"] == got["pair"] == got["kernel"]
    assert len(got["sql"]) > 0


def test_scorers_agree_embedding_dup_clusters(spark, sf_dir, monkeypatch):
    """The fused pairs->CC operator: all three tiers produce identical
    cluster labelings, every planted dup (vec_id + 1,000,000) lands in
    its base vector's component with the base as canonical, and labels
    obey the transitive-closure invariant (canonical_id is itself a
    member with is_canonical=True)."""
    from docling_nlp_api_spark.operators.dedup import (
        PLANT_OFFSET,
        VEC_PLANT_EVERY,
        embedding_dup_clusters,
    )

    got = _all_tiers(monkeypatch, lambda: embedding_dup_clusters(spark, sf_dir))
    assert got["sql"] == got["pair"] == got["kernel"]
    rows = got["kernel"]
    assert len(rows) > 0
    label = {vec_id: canon for vec_id, canon, _ in rows}
    canonical = {vec_id for vec_id, _, is_c in rows if is_c}
    # every canonical_id is a clustered member flagged canonical
    assert set(label.values()) <= canonical
    # every plant is a scaled copy of its base: same component, and the
    # base (smaller id) is the component minimum unless an even-nearer
    # neighbor absorbed both — either way they share one label
    plants = [(v - PLANT_OFFSET, v) for v in label if v >= PLANT_OFFSET]
    assert plants, "no planted dups clustered"
    for base, plant in plants:
        assert label.get(base) == label[plant]
    assert all(base % VEC_PLANT_EVERY == 0 for base, _ in plants)


def test_pair_dot_and_norm_analytic(spark, monkeypatch):
    """Ground truth independent of BOTH scorers: hand-computed cosine of
    two fixed vectors (padded to dim 4 for brevity; the kernels are
    dim-agnostic)."""
    monkeypatch.setenv("SPARK_GRAFT_ANN_SCORER", "arrow")
    from pyspark.sql import functions as F

    from docling_nlp_api_spark.operators import vecmath

    a, b = [1.0, 2.0, 3.0, 4.0], [4.0, 3.0, 2.0, 1.0]
    df = (
        spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
        .select(
            "a",
            "b",
            vecmath.pair_dot(F.col("a"), F.col("b")).alias("dot"),
            vecmath.vec_norm(F.col("a")).alias("na"),
            vecmath.vec_norm(F.col("b")).alias("nb"),
        )
        .select("dot", "na", "nb", vecmath.cosine4("a", "b", "na", "nb").alias("cos4"))
    )
    r = df.first()
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    assert r["dot"] == pytest.approx(dot)
    assert r["na"] == pytest.approx(na)
    assert r["nb"] == pytest.approx(nb)
    assert r["cos4"] == round(dot / (na * nb), 4)


def test_plane_bits_analytic(spark, monkeypatch):
    """Sign-bit bucket vs hand computation for two planes where the signs
    are unambiguous (|dot| >> 0)."""
    from pyspark.sql import functions as F

    from docling_nlp_api_spark.operators import vecmath

    planes = [[1.0, 0.0], [0.0, -1.0]]
    df = spark.createDataFrame(
        [([3.0, 5.0],), ([-3.0, -5.0],)], "v array<float>"
    ).select(vecmath.plane_bits_udf(planes)(F.col("v")).alias("bucket"))
    got = [r["bucket"] for r in df.collect()]
    # v0: dot(p0)=3>0 -> bit0; dot(p1)=-5<0 -> no bit1 => 1
    # v1: dot(p0)=-3<0; dot(p1)=5>0 -> bit1 => 2
    assert got == [1, 2]


def test_per_query_topk_numpy():
    """Pure-NumPy check of the partition-end prune: per query, top-k by
    raw cosine plus everything inside KEEP_BAND of the k-th best."""
    import numpy as np

    from docling_nlp_api_spark.operators import vecmath

    q = np.array([7, 7, 7, 7, 9, 9], dtype=np.int64)
    c = np.array([1, 2, 3, 4, 1, 2], dtype=np.int64)
    s = np.array([0.9, 0.5, 0.89995, 0.1, 0.3, 0.2])
    kq, kc, ks = vecmath.per_query_topk(q, c, s, k=1)
    got = sorted(zip(kq.tolist(), kc.tolist(), ks.tolist()))
    # query 7: top-1 = cand 1 (0.9); cand 3 (0.89995) is within KEEP_BAND
    # of the 1st-best so it must survive too; 0.5/0.1 pruned.
    # query 9: top-1 = cand 1 (0.3); 0.2 is 0.1 away -> pruned.
    assert got == [(7, 1, 0.9), (7, 3, 0.89995), (9, 1, 0.3)]


def test_kernel_band_keeps_round4_ties(spark, monkeypatch):
    """Two candidates whose RAW cosines differ by < 1e-4 but round to the
    SAME 4-decimal value must BOTH survive kernel pruning (KEEP_BAND), so
    the JVM window can break the rounded tie by cand_id ASC — here the
    lower-id candidate has the (slightly) WORSE raw cosine and must still
    win rank 1. Also pins the self-pair mask (query 0 is in the corpus)."""
    import numpy as np

    from docling_nlp_api_spark.operators import similarity as sim

    # cos([1,0],[1,t]) = 1/sqrt(1+t^2); t=0.0135 -> 0.99990889...,
    # t=0.0130 -> 0.99991551... — both round to 0.9999, raw gap 6.6e-6.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0135]),  # lower id, worse raw, same round4
            (2, [1.0, 0.0130]),  # better raw
            (3, [0.0, 1.0]),  # far away
        ],
        "vec_id long, embedding array<float>",
    )
    Q = np.array([[1.0, 0.0]])
    groups = {0: (np.array([0]), Q, np.sqrt((Q * Q).sum(axis=1)))}
    got = {
        r["rk"]: (r["cand_id"], r["cosine"])
        for r in sim._kernel_topk(emb, 2, groups).collect()
    }
    assert got[1] == (1, 0.9999)  # id tiebreak on the rounded value
    assert got[2] == (2, 0.9999)
    assert len(got) == 2  # k=2: vec 3 pruned, query 0 never self-matched


def test_assign_and_probe_tie_rule(spark, monkeypatch):
    """A vector EXACTLY equidistant from two centroids must pick the
    lower cluster id in both scorers (the (d, j) contract)."""
    from pyspark.sql import functions as F

    cents = [[1.0, 0.0], [-1.0, 0.0], [0.0, 10.0]]
    df = spark.createDataFrame([([0.0, 0.0],)], "embedding array<float>")
    for scorer in ("sql", "arrow"):
        monkeypatch.setenv("SPARK_GRAFT_ANN_SCORER", scorer)
        r = df.select(
            S._assign(cents).alias("cl"),
            S._probe_list(cents, 2).alias("probes"),
        ).first()
        assert r["cl"] == 0, scorer
        assert list(r["probes"]) == [0, 1], scorer
