"""Property tests for the passage-dedup plane (dedup.duplicate_passages /
duplicate_passage_rewrite): on arbitrary small corpora drawn from a tiny
vocabulary (so cross-doc gram collisions are common), the Spark plan must
equal a brute-force Python reference — set-of-gram detection, min-owner
attribution, interval-union region merge, and the token-space rewrite."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from docling_nlp_api_spark.operators.dedup import (
    duplicate_passage_rewrite,
    duplicate_passages,
)
from docling_nlp_api_spark.spec import TOKEN_RE

K = 3  # small gram width so short random docs still collide


def _toks(text: str) -> list[str]:
    return re.findall(TOKEN_RE, text.lower())


def _grams(toks: list[str]) -> list[tuple[int, tuple[str, ...]]]:
    return [(i, tuple(toks[i : i + K])) for i in range(len(toks) - K + 1)]


def _merge(positions: list[int]) -> list[tuple[int, int]]:
    """Union of [p, p+K-1] intervals over sorted positions."""
    regions: list[list[int]] = []
    for p in sorted(positions):
        if regions and p <= regions[-1][1] + 1:
            regions[-1][1] = max(regions[-1][1], p + K - 1)
        else:
            regions.append([p, p + K - 1])
    return [(s, e) for s, e in regions]


def ref_passages(batch: dict[int, str]):
    toks = {d: _toks(t) for d, t in batch.items()}
    gram_docs: dict[tuple[str, ...], set[int]] = {}
    for d, ts in toks.items():
        for _, g in _grams(ts):
            gram_docs.setdefault(g, set()).add(d)
    detect, rewrite = {}, {}
    for d, ts in toks.items():
        if len(ts) < K:
            continue
        gs = _grams(ts)
        dup = [i for i, g in gs if len(gram_docs[g]) >= 2]
        regions = _merge(dup)
        cov = sum(e - s + 1 for s, e in regions)
        detect[d] = (len(gs), len(dup), len(regions), round(cov / len(ts), 4))
        cut = [i for i, g in gs if len(gram_docs[g]) >= 2 and min(gram_docs[g]) != d]
        cregions = _merge(cut)
        removed = set()
        for s, e in cregions:
            removed.update(range(s, e + 1))
        kept = [t for i, t in enumerate(ts) if i not in removed]
        rewrite[d] = (
            len(ts),
            len(removed),
            len(cregions),
            hashlib.md5(" ".join(kept).encode()).hexdigest() if kept else None,
        )
    return detect, rewrite


_word = st.sampled_from(["aaa", "bbb", "ccc", "ddd", "eee", "fff"])
corpora = st.lists(
    st.lists(_word, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpora)
def test_passage_plane_matches_python_reference(spark, batch_texts):
    batch = dict(enumerate(batch_texts))
    df = spark.createDataFrame(list(batch.items()), "doc_id long, text string")
    want_detect, want_rewrite = ref_passages(batch)

    got_detect = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["n_dup_regions"], r["dup_frac"])
        for r in duplicate_passages(df, k=K).collect()
    }
    assert got_detect == want_detect, f"texts={batch_texts!r}"

    got_rewrite = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["n_regions_removed"], r["clean_hash"])
        for r in duplicate_passage_rewrite(df, k=K).collect()
    }
    assert got_rewrite == want_rewrite, f"texts={batch_texts!r}"


def _ref_segment_boilerplate(texts, seg_tokens=10, doc_threshold=2):
    """Direct Python mirror of dedup.segment_boilerplate semantics."""
    import hashlib
    import math
    import re as _re

    from docling_nlp_api_spark.spec import TOKEN_RE as _TR

    segs = {}
    for d, t in texts.items():
        toks = _re.findall(_TR, t.lower())
        segs[d] = [
            " ".join(toks[i * seg_tokens : (i + 1) * seg_tokens])
            for i in range(math.ceil(len(toks) / seg_tokens))
        ]
    from collections import Counter

    docs_per_seg = Counter()
    for d, ss in segs.items():
        for s in set(ss):
            docs_per_seg[s] += 1
    out = {}
    for d, ss in segs.items():
        if not ss:
            continue
        common = [s for s in ss if docs_per_seg[s] >= doc_threshold]
        kept = [s for s in ss if docs_per_seg[s] < doc_threshold]
        clean = hashlib.md5(" ".join(kept).encode()).hexdigest() if kept else None
        out[d] = (len(ss), len(common), round(len(common) / len(ss), 4), clean)
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpora)
def test_segment_boilerplate_matches_python_reference(spark, batch_texts):
    """CCNet segment dedup equals its Python mirror on random corpora
    drawn from a tiny vocabulary (short docs -> most docs are a single
    partial window, maximizing shared-segment collisions)."""
    from docling_nlp_api_spark.operators.dedup import segment_boilerplate

    batch = dict(enumerate(batch_texts))
    df = spark.createDataFrame(list(batch.items()), "doc_id long, text string")
    want = _ref_segment_boilerplate(batch)
    got = {
        r["doc_id"]: (r["n_segments"], r["n_boilerplate"],
                      r["boilerplate_frac"], r["clean_hash"])
        for r in segment_boilerplate(df).collect()
    }
    assert got == want, f"texts={batch_texts!r}"
