"""The Arrow-native kernel (extract_arrow) must match the reference
pandas kernel (extract.extract_batch) span-for-span on every doc shape:
plain/HTML/PDF flavors, shuffled offsets, mega-docs, unknown kinds,
hyphen merges, empty spans, empty batches."""

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from docling_nlp_api_spark.datagen import gen_doc
from docling_nlp_api_spark.operators.extract import extract_batch
from docling_nlp_api_spark.operators.extract_arrow import extract_record_batch

SPAN_T = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
            ("bbox", pa.list_(pa.float64())),
        ]
    )
)

# pre-bbox input shape: both kernels must tolerate spans without the field
SPAN_T_NOBB = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)


def to_batch(ids, spans_rows, span_t=SPAN_T):
    return pa.RecordBatch.from_arrays(
        [pa.array(ids), pa.array(spans_rows, type=span_t)], names=["doc_id", "spans"]
    )


def pandas_ref(spans_rows, with_bbox=True):
    cols = {}
    for name, key, dt in [
        ("k", "kind", object), ("t", "text", object), ("r", "media_ref", object), ("o", "offset", np.int64),
    ]:
        cols[name] = pd.Series([np.array([s[key] for s in sp], dtype=dt) for sp in spans_rows])
    bb = (
        pd.Series([[s.get("bbox") for s in sp] for sp in spans_rows], dtype=object)
        if with_bbox
        else None
    )
    return extract_batch(cols["k"], cols["t"], cols["r"], cols["o"], bb)


def assert_parity(ids, spans_rows, span_t=SPAN_T, with_bbox=True):
    got = extract_record_batch(to_batch(ids, spans_rows, span_t)).to_pydict()
    ref = pandas_ref(spans_rows, with_bbox)
    for i in range(len(ids)):
        g = (
            list(got["kinds"][i]), list(got["texts"][i]), list(got["media_refs"][i]),
            list(got["orders"][i]), list(got["bboxes"][i]), got["status"][i], got["error"][i],
            got["word_count"][i], got["char_count"][i], got["has_images"][i], got["has_tables"][i],
        )
        r = (
            list(ref["kinds"].iloc[i]), list(ref["texts"].iloc[i]), list(ref["media_refs"].iloc[i]),
            [int(x) for x in ref["orders"].iloc[i]],
            [x if x is None else list(x) for x in ref["bboxes"].iloc[i]],
            str(ref["status"].iloc[i]), ref["error"].iloc[i],
            int(ref["word_count"].iloc[i]), int(ref["char_count"].iloc[i]),
            bool(ref["has_images"].iloc[i]), bool(ref["has_tables"].iloc[i]),
        )
        assert g == r, f"doc {ids[i]} diverges: {g} != {r}"


@pytest.mark.parametrize("shuffle", [False, True])
def test_generated_docs(shuffle):
    ids, rows = [], []
    for num in list(range(0, 250)) + [997, 1994]:  # incl. mega docs
        did, sp = gen_doc(num)
        sp = list(sp)
        if shuffle:
            random.Random(num).shuffle(sp)
        ids.append(did)
        rows.append(sp)
    assert_parity(ids, rows)


def test_adversarial_docs():
    def S(k, t, r, o):
        return {"kind": k, "text": t, "media_ref": r, "offset": o}

    cases = {
        "empty": [],
        "unknown": [S("martian", "x", "", 0), S("p", "hello world", "", 1)],
        "all_media": [S("image", "", "m://0", 0), S("table", "a b", "m://1", 1)],
        "all_boiler": [S("nav", "home", "", 0), S("footer", "c", "", 1)],
        "hyphen_merge": [S("body", "li-", "", 0), S("body", " ne", "", 1), S("pageno", "3", "", 2)],
        "hyphen_lone": [S("body", "-", "", 0), S("body", "x", "", 1)],
        "hyphen_tail": [S("body", "end-", "", 0)],
        "ws_only": [S("p", " ", "", 5), S("h1", "T", "", 2)],
        "caption_only": [S("caption", "cap", "", 0)],
    }
    assert_parity(list(cases), list(cases.values()))


def test_empty_batch():
    out = extract_record_batch(to_batch([], []))
    assert out.num_rows == 0


def test_no_bbox_input_shape():
    """Inputs conforming to the pre-bbox span struct (the BASELINE
    input_hint's exact 4-field shape) must still extract, with every
    output bbox null."""
    ids, rows = [], []
    for num in range(40):
        did, sp = gen_doc(num)
        ids.append(did)
        rows.append([{k: s[k] for k in ("kind", "text", "media_ref", "offset")} for s in sp])
    assert_parity(ids, rows, span_t=SPAN_T_NOBB, with_bbox=False)
    got = extract_record_batch(to_batch(ids, rows, SPAN_T_NOBB)).to_pydict()
    assert all(bb is None for doc in got["bboxes"] for bb in doc)


def _span(kind, text, off, ref=None):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off, "bbox": None}


def test_unicode_whitespace_word_counts_match_oracle():
    """SPEC pins Python str.split() word semantics. NBSP/ideographic-space
    separated candidate text must classify identically in the oracle and
    BOTH kernels (the byte-level fast path only covered ASCII whitespace
    before the slow-path fix — an NBSP paragraph was miscounted as one
    word, labelled UNDECIDED, and dropped)."""
    from docling_nlp_api_spark.oracle.extract import extract_doc

    nbsp_words = " ".join("abcdefgh")          # 8 Python words
    ideo = "x　y　z w v u t s"               # 8 words, U+3000
    fs = "a\x1cb\x1cc d e f g h"                     # \x1c is Python-space
    docs = {
        "d1": [_span("h1", "T", 0), _span("p", nbsp_words, 1)],
        "d2": [_span("h1", "T", 0), _span("p", ideo, 1)],
        "d3": [_span("h1", "T", 0), _span("p", fs, 1)],
    }
    for did, spans in docs.items():
        exp = extract_doc(did, spans)
        got = extract_record_batch(to_batch([did], [spans])).to_pydict()
        assert got["status"][0] == exp.status, did
        assert list(got["kinds"][0]) == [s.kind for s in exp.spans], did
        assert got["word_count"][0] == int(exp.metadata["word_count"]), did
        ref = pandas_ref([spans])
        assert list(ref["kinds"][0]) == [s.kind for s in exp.spans], did
        # the p span survives as content (>= MIN_CONTENT_WORDS words)
        assert "p" in got["kinds"][0], did


def test_mixed_flavor_pdf_kinds_in_html_doc_match_oracle():
    """FIXTURES declares mixed docs invalid, but both the oracle and the
    kernels ACCEPT them — so they must agree: a PDF kind inside an
    HTML-flavor doc takes the oracle's else-branch (content) instead of
    being silently dropped."""
    from docling_nlp_api_spark.oracle.extract import extract_doc

    spans = [
        _span("p", "one two three four five six seven eight", 0),
        _span("body", "pdf body text here", 1),
        _span("li", "tiny", 2),  # undecided -> smoothing between content
        _span("heading", "section", 3),
    ]
    exp = extract_doc("dm", spans)
    exp_seq = [(s.kind, s.text) for s in exp.spans]
    got = extract_record_batch(to_batch(["dm"], [spans])).to_pydict()
    assert list(zip(got["kinds"][0], got["texts"][0])) == exp_seq
    ref = pandas_ref([spans])
    assert list(zip(ref["kinds"][0], ref["texts"][0])) == exp_seq
    assert ("body", "pdf body text here") in exp_seq  # oracle keeps it


def test_null_span_fields_degrade_to_doc_failure_not_crash():
    """External drop-zone parquet can carry null kind/text/offset (Spark
    does not enforce schema non-null flags on file sources). A null kind
    must produce ONE failed doc row via the normal unknown-kind path —
    not NaN-index garbage or an IndexError that kills the micro-batch."""
    ok = [_span("p", "regular doc with enough words here", 0)]
    null_kind = [_span(None, "x", 0), _span("p", "y z", 1)]
    null_text = [_span("p", None, 0), _span("h1", "t", 1)]
    null_off = [_span("h1", "a", None), _span("p", "b c d e f g h i", 1)]
    got = extract_record_batch(
        to_batch(["g1", "b1", "b2", "b3"], [ok, null_kind, null_text, null_off])
    ).to_pydict()
    assert got["status"] == ["completed", "failed", "completed", "completed"]
    assert "unknown" in (got["error"][1] or "")
    # null text folded to "" (0 words), null offset to 0 (sorts first)
    assert got["status"][2] == "completed"
