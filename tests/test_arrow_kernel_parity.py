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
