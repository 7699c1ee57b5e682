"""Edge-case corpus (FIXTURES.md §4) — each doc pins a SPEC/SURVEY quirk."""

import pytest
from pyspark.sql import functions as F

from docling_nlp_api_spark.operators.extract import extract
from docling_nlp_api_spark.oracle.extract import extract_doc
from docling_nlp_api_spark.schema import DOCUMENTS_SPANS_SCHEMA


def sp(kind, text, media_ref, offset):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


EDGE_DOCS = {
    "empty": [],
    "all_boilerplate": [
        sp("nav", "home about", "", 0),
        sp("script", "var x", "", 1),
        sp("footer", "copyright somebody", "", 2),
    ],
    "media_only": [
        sp("image", "", "media://media_only/0", 0),
        sp("table", "a caption", "media://media_only/1", 1),
        sp("image", "", "media://media_only/2", 2),
    ],
    "whitespace_runs": [
        sp("p", "alpha  \t beta \n gamma delta epsilon zeta eta theta", "", 0),
    ],
    "trailing_space": [
        sp("p", "one two three four five six seven eight ", "", 0),
        sp("p", " leading and trailing  ", "", 1),
    ],
    "hyphen_merge": [
        sp("title", "doc title here", "", 0),
        sp("body", "start of the docu-", "", 1),
        sp("body", "ment continues here with more than enough words to be long", "", 2),
        sp("body", "chain one two alpha-", "", 3),
        sp("body", "beta-", "", 4),
        sp("body", "gamma ends the chain", "", 5),
    ],
    "hyphen_media_between": [
        sp("body", "split wor-", "", 0),
        sp("image", "", "media://x/1", 1),
        sp("body", "d continues", "", 2),
    ],
    "unicode": [
        sp("p", "héllo wörld 你好世界 مرحبا 🙂 abc defghi jklmno pqrstu vwxyz", "", 0),
    ],
    "shuffled": [
        sp("footer", "footer text", "", 3),
        sp("p", "this paragraph has plenty of words to be classified content", "", 1),
        sp("h1", "title first", "", 0),
        sp("li", "short li", "", 2),
    ],
    "bad_kind": [
        sp("p", "fine text with many words here to pass the bar", "", 0),
        sp("blink", "what is this", "", 1),
        sp("marquee", "also bad", "", 2),
    ],
    "smoothing_sandwich": [
        sp("p", "long content paragraph one with definitely enough words here", "", 0),
        sp("p", "tiny", "", 1),
        sp("p", "long content paragraph two with definitely enough words here", "", 2),
        sp("p", "tiny two", "", 3),
        sp("a", "link", "", 4),
    ],
    "pdf_repeat": [
        sp("body", "Confidential Draft", "", 0),
        sp("body", "real content paragraph with plenty of words to keep around", "", 1),
        sp("body", "Confidential Draft", "", 2),
        sp("body", "another real content paragraph with plenty of words to keep", "", 3),
        sp("body", "Confidential Draft", "", 4),
    ],
}


@pytest.fixture(scope="module")
def engine_rows(spark):
    data = [(k, v) for k, v in EDGE_DOCS.items()]
    df = spark.createDataFrame(data, schema=DOCUMENTS_SPANS_SCHEMA)
    return {r["doc_id"]: r for r in extract(df).collect()}


@pytest.mark.parametrize("doc_id", sorted(EDGE_DOCS))
def test_edge_doc_matches_oracle(engine_rows, doc_id):
    exp = extract_doc(doc_id, EDGE_DOCS[doc_id])
    got = engine_rows[doc_id]
    got_spans = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in got["spans"]]
    exp_spans = [(s.kind, s.text, s.media_ref, s.order) for s in exp.spans]
    assert got_spans == exp_spans
    assert got["status"] == exp.status
    assert dict(got["metadata"]) == exp.metadata


def test_specific_semantics(engine_rows):
    # empty doc -> completed, empty, zero counts
    e = engine_rows["empty"]
    assert e["status"] == "completed" and e["spans"] == [] and e["metadata"]["word_count"] == "0"
    # all boilerplate -> empty output
    assert engine_rows["all_boilerplate"]["spans"] == []
    # media preserved in order with refs
    m = engine_rows["media_only"]
    assert [s["media_ref"] for s in m["spans"]] == [
        "media://media_only/0", "media://media_only/1", "media://media_only/2"]
    assert m["metadata"]["has_images"] == "true" and m["metadata"]["has_tables"] == "true"
    assert m["metadata"]["word_count"] == "0"  # media text excluded from full_text
    # whitespace runs: python str.split() parity -> 8 words
    assert engine_rows["whitespace_runs"]["metadata"]["word_count"] == "8"
    # bad kind -> failure row naming the smallest-offset unknown kind
    b = engine_rows["bad_kind"]
    assert b["status"] == "failed" and b["metadata"]["error"] == "unknown kind: blink"
    assert b["spans"] == []
    # hyphen merge joins the word
    h = engine_rows["hyphen_merge"]
    texts = [s["text"] for s in h["spans"]]
    assert any(t.startswith("start of the document continues") for t in texts)
    assert any("alphabetagamma ends the chain" in t for t in texts)
    # media between hyphen parts does not break the merge
    hm = engine_rows["hyphen_media_between"]
    assert [s["text"] for s in hm["spans"] if s["kind"] == "body"] == ["split word continues"]
    # shuffled storage order: output follows offset order; the short li
    # sits between content-p and boiler-footer -> smoothing drops it
    sh = engine_rows["shuffled"]
    assert [s["kind"] for s in sh["spans"]] == ["h1", "p"]
    # smoothing: tiny p between two long content ps is content; the one
    # before a link is boilerplate
    sm = [s["text"] for s in engine_rows["smoothing_sandwich"]["spans"]]
    assert "tiny" in sm and "tiny two" not in sm
    # pdf repeated short block dropped
    pr = [s["text"] for s in engine_rows["pdf_repeat"]["spans"]]
    assert "Confidential Draft" not in pr and len(pr) == 2


def test_mega_doc_slow(spark):
    # 100k-span single doc: arrow batch sizing survives (marked slow-ish but fast enough)
    spans = [sp("body", f"word{i} alpha beta gamma delta epsilon zeta eta", "", i) for i in range(100_000)]
    df = spark.createDataFrame([("mega", spans)], schema=DOCUMENTS_SPANS_SCHEMA)
    row = extract(df).collect()[0]
    assert row["status"] == "completed"
    assert len(row["spans"]) == 100_000
    assert row["metadata"]["word_count"] == str(100_000 * 8)
