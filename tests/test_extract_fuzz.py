"""Seeded chaos-fuzz of the north-rule invariant: 400 randomly built
(schema-valid) documents, engine vs single-node oracle, exact
span-sequence equality on (kind, text, media_ref, order) plus status,
metadata, pages, and bboxes.

The structured generators (datagen.py) and the hand-planted edge corpus
(test_edge_cases.py) each pin known quirks; this suite instead samples
the input space adversarially — whitespace torture, trailing-hyphen
chains at random positions, empty texts, unicode, exact short repeats
(the PDF repeat rule's trigger), unknown kinds, shuffled storage order,
and sparse random bboxes — under a FIXED seed so failures reproduce.
Per FIXTURES.md the flavor-mix constraint holds (a doc draws kinds from
one flavor's vocabulary; mixed docs are invalid inputs by contract)."""

from __future__ import annotations

import random

import pytest

from docling_nlp_api_spark.operators.extract import extract
from docling_nlp_api_spark.oracle.extract import extract_doc
from docling_nlp_api_spark.schema import DOCUMENTS_SPANS_SCHEMA
from docling_nlp_api_spark.spec import (
    HTML_KINDS,
    MEDIA_KINDS,
    PDF_KINDS,
    SHARED_KINDS,
)

N_DOCS = 400
SEED = 20260819

WORDS = (
    "alpha beta gamma delta epsilon zeta the and of to in было слово 你好 "
    "mañana naïve Ω mixedCASE x yz longerwordhere punctuation, trailing. "
    "the a of and to in is it"  # stopword-heavy tail
).split()
# joiners include PYTHON whitespace beyond ASCII (NBSP, ideographic
# space, NEL, FS) — str.split() treats them as separators and the kernel
# must agree (the round-4 slow-path fix); and non-space confusables that
# share UTF-8 lead bytes with Unicode spaces (en dash, CJK) so the
# slow-path trigger's over-match cannot corrupt counts either
WS = [" ", "  ", "\t", " \t ", "\n", " \n ", "\xa0", "　", "\x85", "\x1c", " \xa0 "]
UNKNOWN_KINDS = ["blink", "marquee", "weird"]


def _text(rng: random.Random) -> str:
    n = rng.randint(0, 14)
    parts = [rng.choice(WORDS) for _ in range(n)]
    s = ""
    for w in parts:
        s += w + rng.choice(WS)
    if rng.random() < 0.2:
        s = rng.choice(WS) + s
    if rng.random() < 0.15:
        s = s.rstrip() + "-"  # trailing hyphen: merge candidate
    if rng.random() < 0.05:
        s = ""
    return s


def _gen_doc(rng: random.Random, doc_id: str) -> list[dict]:
    flavor_kinds = sorted(HTML_KINDS if rng.random() < 0.5 else PDF_KINDS)
    n = rng.choice([0, 1, 2, rng.randint(3, 40)])
    repeat_text = " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 5)))
    spans = []
    for off in range(n):
        r = rng.random()
        if r < 0.12:
            kind = rng.choice(sorted(MEDIA_KINDS))
            spans.append(
                {
                    "kind": kind,
                    "text": "" if rng.random() < 0.7 else _text(rng),
                    "media_ref": f"media://{doc_id}/{off}",
                    "offset": off,
                }
            )
            continue
        if r < 0.14:
            kind = rng.choice(sorted(SHARED_KINDS))
        elif r < 0.16:
            kind = rng.choice(UNKNOWN_KINDS)
        elif r < 0.19:
            # cross-flavor contamination: FIXTURES calls mixed docs
            # invalid, but both engine and oracle ACCEPT them, so their
            # agreement (PDF kind in an HTML doc -> oracle else-branch
            # content) is part of the pinned surface
            other = PDF_KINDS if flavor_kinds == sorted(HTML_KINDS) else HTML_KINDS
            kind = rng.choice(sorted(other))
        else:
            kind = rng.choice(flavor_kinds)
        text = repeat_text if rng.random() < 0.12 else _text(rng)
        span = {"kind": kind, "text": text, "media_ref": "", "offset": off}
        if "body" in flavor_kinds and rng.random() < 0.5:
            x0, y0 = rng.uniform(0, 500), rng.uniform(0, 700)
            span["bbox"] = [x0, y0, x0 + rng.uniform(1, 100), y0 + rng.uniform(1, 40)]
        spans.append(span)
    rng.shuffle(spans)  # storage order is not source order
    return spans


@pytest.fixture(scope="module")
def fuzz_corpus():
    rng = random.Random(SEED)
    return {f"fz{n:05d}": _gen_doc(rng, f"fz{n:05d}") for n in range(N_DOCS)}


@pytest.fixture(scope="module")
def fuzz_engine_rows(spark, fuzz_corpus):
    df = spark.createDataFrame(
        sorted(fuzz_corpus.items()), schema=DOCUMENTS_SPANS_SCHEMA
    )
    return {r["doc_id"]: r for r in extract(df).collect()}


def test_fuzz_span_sequence_equality(fuzz_engine_rows, fuzz_corpus):
    assert len(fuzz_engine_rows) == N_DOCS
    mismatches = []
    for did, spans in fuzz_corpus.items():
        exp = extract_doc(did, spans)
        got = fuzz_engine_rows[did]
        got_t = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in got["spans"]]
        exp_t = [(s.kind, s.text, s.media_ref, s.order) for s in exp.spans]
        ok = (
            got_t == exp_t
            and got["status"] == exp.status
            and dict(got["metadata"]) == exp.metadata
            and list(got["span_pages"] or []) == (exp.pages or [])
            and [None if b is None else list(b) for b in (got["span_bboxes"] or [])]
            == (exp.bboxes or [])
        )
        if not ok:
            mismatches.append((did, exp_t[:3], got_t[:3]))
    assert not mismatches, f"{len(mismatches)} docs mismatch; first: {mismatches[0]}"


def test_fuzz_has_failures_and_empties(fuzz_engine_rows):
    """The corpus must actually exercise the interesting regions: some
    failure rows (unknown kinds), some empty outputs, some media spans —
    otherwise the equality test above is vacuous over them."""
    statuses = [r["status"] for r in fuzz_engine_rows.values()]
    assert statuses.count("failed") >= 20
    kept = [len(r["spans"]) for r in fuzz_engine_rows.values()]
    assert kept.count(0) >= 20 and max(kept) >= 10
    assert any(
        s["media_ref"] for r in fuzz_engine_rows.values() for s in r["spans"]
    )
