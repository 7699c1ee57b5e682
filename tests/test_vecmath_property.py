"""Property tests for the pure-NumPy vecmath kernels (no Spark session):
the in-kernel connected components and the two-level top-k prune are the
load-bearing primitives of the embedding plane's kernel scorer — each is
checked here against an independent brute-force reference over
hypothesis-generated inputs, not just the planted fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_nlp_api_spark.operators.vecmath import (
    KEEP_BAND,
    _local_components,
    per_query_topk,
)


class _UnionFind:
    """Independent reference: path-halving union-find."""

    def __init__(self, n: int) -> None:
        self.p = list(range(n))

    def find(self, x: int) -> int:
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


edges_strategy = st.integers(min_value=1, max_value=50).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ),
            max_size=120,
        ),
    )
)


@settings(max_examples=200, deadline=None)
@given(edges_strategy)
def test_local_components_matches_union_find(case):
    """Same-component iff same label, and every label is the MIN node
    index of its component (the star-contraction root contract: roots
    are min-ids so cross-bucket CC rounds converge on global minima)."""
    n, edge_list = case
    i = np.array([a for a, _ in edge_list], dtype=np.int64)
    j = np.array([b for _, b in edge_list], dtype=np.int64)
    labels = _local_components(n, i, j)

    uf = _UnionFind(n)
    for a, b in edge_list:
        uf.union(a, b)
    comp_min: dict[int, int] = {}
    for x in range(n):
        r = uf.find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    expect = np.array([comp_min[uf.find(x)] for x in range(n)], dtype=np.int64)
    assert np.array_equal(labels, expect)


topk_strategy = st.tuples(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # query_id
            st.integers(min_value=0, max_value=10**6),  # cand_id
            st.floats(
                min_value=-1.0, max_value=1.0, allow_nan=False, width=64
            ),  # cosine
        ),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=1, max_value=8),  # k
)


@settings(max_examples=200, deadline=None)
@given(topk_strategy)
def test_per_query_topk_superset_contract(case):
    """The prune's documented guarantee, against a per-query brute force:
    (a) every kept row is within KEEP_BAND of its query's k-th best raw
    score (or in the raw top-k), (b) NOTHING outside the band is lost —
    the kept set is exactly {rank < k} ∪ {score >= kth - KEEP_BAND},
    which is a superset of any rounding-monotone final top-k."""
    triples, k = case
    q = np.array([t[0] for t in triples], dtype=np.int64)
    c = np.array([t[1] for t in triples], dtype=np.int64)
    s = np.array([t[2] for t in triples], dtype=np.float64)
    kq, kc, ks = per_query_topk(q, c, s, k)

    kept = set(zip(kq.tolist(), kc.tolist(), ks.tolist()))
    expect: set[tuple[int, int, float]] = set()
    for qid in np.unique(q):
        sel = q == qid
        scores = np.sort(s[sel])[::-1]
        kth = scores[min(k, scores.shape[0]) - 1]
        # stable per-row decision: rank-based OR band-based. Ties on the
        # k-th score are all band-kept, so rank ambiguity cannot matter.
        for cid, sc in zip(c[sel].tolist(), s[sel].tolist()):
            if sc >= kth - KEEP_BAND:
                expect.add((int(qid), int(cid), sc))
    # duplicates (same q,c,s triple appearing twice) collapse identically
    # in both sets, so set equality is the right comparison
    assert kept == expect
