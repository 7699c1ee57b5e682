"""Property test for the row-local keyword ranker (exports.with_keywords):
for arbitrary text, the JVM higher-order-function pipeline must equal the
reference Python computation (re.findall tokenizer + Counter + (freq desc,
word asc) ties + round(freq/total, 6) scores)."""

from __future__ import annotations

import re
from collections import Counter

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from docling_nlp_api_spark.operators.exports import with_keywords
from docling_nlp_api_spark.spec import STOPWORDS_40, TOKEN_RE


def ref_keywords(text: str, k: int = 20):
    toks = re.findall(TOKEN_RE, text.lower())
    total = len(toks)
    counts = Counter(w for w in toks if w not in STOPWORDS_40)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(w, c, round(c / total, 6)) for w, c in top]


_word = st.sampled_from(
    ["the", "and", "for", "cat", "dog", "dogs", "ing", "tion", "été", "aaa", "ab", "Dog"]
)
_sep = st.sampled_from([" ", "  ", ".", ", ", "!?", "\n", "\t", "-", "—", ""])
texts = st.lists(
    st.lists(st.tuples(_word, _sep), max_size=25).map(
        lambda ps: "".join(w + s for w, s in ps)
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts)
def test_with_keywords_matches_python_reference(spark, batch):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, export_text string"
    )
    got = {
        r["doc_id"]: [(s["word"], s["frequency"], s["score"]) for s in r["keywords"]]
        for r in with_keywords(df).select("doc_id", "keywords").collect()
    }
    for i, t in enumerate(batch):
        assert got[i] == ref_keywords(t), f"text={t!r}"
