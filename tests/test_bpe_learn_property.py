"""Property test for the iterative BPE learner (sampling.bpe_learn): on
arbitrary small corpora the distributed driver-loop must produce the
same merge table as a direct Python BPE trainer — same greedy
left-to-right non-overlapping merges, same (count desc, a asc, b asc)
tie-breaks, same counts."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from docling_nlp_api_spark.operators.sampling import bpe_learn
from docling_nlp_api_spark.spec import TOKEN_RE


def ref_bpe(texts: list[str], n_merges: int):
    words = Counter(w for t in texts for w in re.findall(TOKEN_RE, t.lower()))
    syms = {w: [c for c in w] for w in words}
    merges = []
    for rnd in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, ss in syms.items():
            for i in range(1, len(ss)):
                counts[(ss[i - 1], ss[i])] += words[w]
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, a, b, cnt))
        for w, ss in syms.items():
            out: list[str] = []
            for s in ss:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms[w] = out
    return merges


_word = st.sampled_from(["aaa", "aab", "abab", "bba", "ccc", "cab"])
corpora = st.lists(
    st.lists(_word, min_size=1, max_size=8).map(" ".join),
    min_size=1,
    max_size=4,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpora)
def test_bpe_learn_matches_python_reference(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = [tuple(r) for r in bpe_learn(df, n_merges=4).collect()]
    assert got == ref_bpe(texts, 4), f"texts={texts!r}"


def test_bpe_learn_nonoverlap(spark):
    """Greedy non-overlap: 'aaaa' under merge (a,a) becomes [aa, aa], so
    round 3 can merge (aa, aa) — a strictly-sequential semantics a naive
    pairwise recount would get wrong."""
    df = spark.createDataFrame(
        [(1, "aaaa aaaa bbb"), (2, "aaab aaab")], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_learn(df, n_merges=4).collect()]
    assert got == [
        (1, "a", "a", 10),
        (2, "a", "b", 2),
        (3, "aa", "aa", 2),
        (4, "aa", "ab", 2),
    ]


def ref_bpe_token_counts(texts: dict[int, str], n_merges: int):
    """Learn merges with ref_bpe, then apply them per word and count."""
    merges = ref_bpe(list(texts.values()), n_merges)

    def encode(word: str) -> int:
        syms = list(word)
        for _, a, b, _c in merges:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return len(syms)

    want = {}
    for d, t in texts.items():
        ws = re.findall(TOKEN_RE, t.lower())
        if not ws:
            continue
        subs = [encode(w) for w in ws]
        want[d] = (len(ws), sum(subs), round(sum(subs) / len(ws), 4))
    return want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpora)
def test_bpe_token_counts_matches_python_reference(spark, texts):
    """BPE APPLY: encoding through the vocabulary mapping equals a
    Python learn-then-encode mirror (same merges, same greedy fold)."""
    from docling_nlp_api_spark.operators.sampling import bpe_token_counts

    batch = dict(enumerate(texts))
    df = spark.createDataFrame(list(batch.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["tokens_per_word"])
           for r in bpe_token_counts(df, n_merges=4).collect()}
    assert got == ref_bpe_token_counts(batch, 4), f"texts={texts!r}"
