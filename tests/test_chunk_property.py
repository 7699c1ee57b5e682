"""Property test for sampling.chunk_overlap: on arbitrary corpora the
Spark chunking must equal a brute-force Python reference — full token
coverage, exact stride/overlap geometry, and hash-exact chunk content."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from docling_nlp_api_spark.operators.sampling import chunk_overlap
from docling_nlp_api_spark.spec import TOKEN_RE

SIZE, STRIDE = 7, 5  # small geometry so short random docs hit every case

WORD = st.sampled_from(["alpha", "bravo", "charlie", "delta", "echo", "fox"])
DOC = st.lists(WORD, min_size=0, max_size=40).map(" ".join)


def ref_chunks(text: str) -> list[tuple[int, int, str]]:
    toks = re.findall(TOKEN_RE, text.lower())
    if not toks:
        return []
    if len(toks) <= SIZE:
        n = 1
    else:
        n = -(-(len(toks) - SIZE) // STRIDE) + 1
    out = []
    for i in range(n):
        chunk = toks[i * STRIDE : i * STRIDE + SIZE]
        out.append(
            (i, len(chunk), hashlib.md5(" ".join(chunk).encode()).hexdigest())
        )
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(DOC, min_size=1, max_size=6))
def test_chunk_overlap_matches_python_reference(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got: dict[int, list[tuple[int, int, str]]] = {}
    for r in chunk_overlap(df, size=SIZE, stride=STRIDE).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.n_tokens, r.chunk_hash)
        )
    for d, text in enumerate(texts):
        expect = ref_chunks(text)
        assert sorted(got.get(d, [])) == expect, (d, text)
        # geometry invariants the reference enforces implicitly: every
        # token index is covered, consecutive chunks overlap by
        # SIZE - STRIDE except a possibly-short tail
        toks = re.findall(TOKEN_RE, text.lower())
        if toks:
            covered = set()
            for i, n_tok, _ in expect:
                covered.update(range(i * STRIDE, i * STRIDE + n_tok))
            assert covered == set(range(len(toks)))
