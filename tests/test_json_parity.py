"""S8 JSON structure parity: the Spark render (exports.nlp_json_col) must
equal the single-node oracle render (oracle.exports.nlp_json) — full deep
equality, with float score compared to 1e-9 (round-half mode at the 6th
decimal is the only representational difference between engines)."""

from __future__ import annotations

import json

import pytest

from docling_nlp_api_spark import datagen
from docling_nlp_api_spark.operators.exports import with_exports
from docling_nlp_api_spark.operators.extract import extract
from docling_nlp_api_spark.oracle.exports import nlp_json
from docling_nlp_api_spark.oracle.extract import extract_doc

N_DOCS = 200


def _deep_eq(a, b, path=""):
    if isinstance(a, float) or isinstance(b, float):
        assert abs(float(a) - float(b)) < 1e-9, (path, a, b)
        return
    assert type(a) == type(b), (path, type(a), type(b), a, b)
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _deep_eq(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, list):
        assert len(a) == len(b), (path, len(a), len(b))
        for i, (x, y) in enumerate(zip(a, b)):
            _deep_eq(x, y, f"{path}[{i}]")
    else:
        assert a == b, (path, a, b)


@pytest.fixture(scope="module")
def engine_json(spark):
    df = with_exports(extract(datagen.spans_df(spark, N_DOCS)), formats=("json",))
    return {
        r["doc_id"]: (r["status"], r["export_json"])
        for r in df.select("doc_id", "status", "export_json").collect()
    }


def test_json_full_parity(engine_json):
    n_checked = 0
    for num in range(N_DOCS):
        did, spans = datagen.gen_doc(num)
        exp = extract_doc(did, spans)
        status, got_raw = engine_json[did]
        assert status == exp.status, did
        if exp.status != "completed":
            continue
        got = json.loads(got_raw)
        want = nlp_json(exp)
        _deep_eq(got, want, did)
        n_checked += 1
    assert n_checked > 100  # the corpus is mostly completed docs


def test_pdf_docs_have_pages(engine_json):
    n_paged = 0
    for num in range(N_DOCS):
        did, spans = datagen.gen_doc(num)
        exp = extract_doc(did, spans)
        if exp.status != "completed" or exp.metadata["page_count"] == "0":
            continue
        got = json.loads(engine_json[did][1])
        assert got["document_info"]["total_pages"] == int(exp.metadata["page_count"])
        assert [p["page_number"] for p in got["pages"]] == list(
            range(1, int(exp.metadata["page_count"]) + 1)
        )
        n_paged += 1
    assert n_paged > 10  # datagen emits a real share of PDF-flavor docs
