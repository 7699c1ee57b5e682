"""Exports S4-S8: builtin renders match the SPEC §5 oracle expectations."""

import json

import pytest

from docling_nlp_api_spark.operators.exports import with_exports
from docling_nlp_api_spark.operators.extract import extract
from docling_nlp_api_spark.schema import DOCUMENTS_SPANS_SCHEMA


def sp(kind, text, media_ref, offset):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


DOC = [
    sp("h1", "Main Title", "", 0),
    sp("p", "first paragraph with plenty of words to be kept as content.", "", 1),
    sp("image", "", "media://x/2", 2),
    sp("li", "a list item with enough words to be content here", "", 3),
    sp("nav", "home about", "", 4),
    sp("p", "second para line one.\n\nsecond para line two! and three?", "", 5),
    sp("table", "tbl caption", "media://x/6", 6),
]


@pytest.fixture(scope="module")
def row(spark):
    df = spark.createDataFrame([("x", DOC)], schema=DOCUMENTS_SPANS_SCHEMA)
    return with_exports(extract(df)).collect()[0]


def test_text(row):
    assert row["export_text"] == (
        "Main Title\n"
        "first paragraph with plenty of words to be kept as content.\n"
        "a list item with enough words to be content here\n"
        "second para line one.\n\nsecond para line two! and three?"
    )


def test_markdown(row):
    md = row["export_markdown"]
    assert md.startswith("# Main Title\n\n")
    assert "![image](media://x/2)" in md
    assert "- a list item" in md
    assert "[table media://x/6] tbl caption" in md
    assert "home about" not in md  # nav stripped before render


def test_html(row):
    h = row["export_html"]
    assert "<h1>Main Title</h1>" in h
    assert '<img src="media://x/2"/>' in h
    assert '<table data-ref="media://x/6">tbl caption</table>' in h


def test_doctags(row):
    dt = row["export_doctags"].splitlines()
    assert dt[0] == '<h1 loc="0">Main Title</h1>'
    assert dt[2] == '<image loc="2">media://x/2</image>'


def test_json(row):
    obj = json.loads(row["export_json"])
    info = obj["document_info"]
    assert info["total_words"] == int(row["metadata"]["word_count"])
    assert info["total_characters"] == int(row["metadata"]["char_count"])
    assert info["total_pages"] == 0  # HTML flavor has no page model
    assert info["has_images"] is True and info["has_tables"] is True
    assert info["language"] == "en"
    # spans join with single \n, so only the explicit \n\n inside span 5
    # creates a paragraph boundary (SPEC §6)
    paras = obj["content"]["paragraphs"]
    assert len(paras) == 2
    p0 = paras[0]
    assert set(p0) == {"id", "text", "word_count", "char_count"}
    assert p0["id"] == 0
    assert p0["word_count"] == len(p0["text"].split())
    assert p0["char_count"] == len(p0["text"])
    sents = obj["content"]["sentences"]
    assert sents[-1]["text"] == "and three"
    assert [s["id"] for s in sents] == list(range(len(sents)))
    assert obj["content"]["entities"] == []
    kws = obj["content"]["keywords"]
    assert kws and all(set(k) == {"word", "frequency", "score"} for k in kws)
    freqs = [k["frequency"] for k in kws]
    assert freqs == sorted(freqs, reverse=True)
    st = obj["structure"]
    assert [h["text"] for h in st["headings"]] == ["Main Title"]
    assert st["headings"][0]["level"] == 1
    assert [li["text"] for li in st["lists"]] == ["a list item with enough words to be content here"]
    assert st["tables"][0]["media_ref"] == "media://x/6"
    assert st["tables"][0]["cell_count"] == 0
    assert st["images"][0]["metadata"]["media_ref"] == "media://x/2"
    assert obj["pages"] == []  # no pageno markers -> no page model


PDF_DOC = [
    sp("title", "Doc Title", "", 0),
    sp("runhead", "running head", "", 1),
    sp("pageno", "1", "", 2),
    sp("body", "first page body line with several words in it.", "", 3),
    sp("image", "", "media://p/4", 4),
    sp("runhead", "running head", "", 5),
    sp("pageno", "2", "", 6),
    sp("body", "second page body line also with plenty of words.", "", 7),
]


def test_json_pages(spark):
    df = spark.createDataFrame([("pdoc", PDF_DOC)], schema=DOCUMENTS_SPANS_SCHEMA)
    row = with_exports(extract(df)).collect()[0]
    assert row["metadata"]["page_count"] == "2"
    # front-matter title belongs to page 1; pageno/runhead are boiler
    assert list(row["span_pages"]) == [1, 1, 1, 2]
    obj = json.loads(row["export_json"])
    assert obj["document_info"]["total_pages"] == 2
    pages = obj["pages"]
    assert [p["page_number"] for p in pages] == [1, 2]
    # each non-media span contributes its text + ' '; media spans excluded
    assert pages[0]["text"] == "Doc Title first page body line with several words in it. "
    assert pages[1]["text"] == "second page body line also with plenty of words. "
    assert [e["type"] for e in pages[0]["elements"]] == ["text", "text"]
    assert pages[0]["bounding_boxes"] == []


def test_page_segments_out_of_order(spark):
    """ADVICE r2: a kernel violating the nondecreasing span_pages
    invariant must degrade (per-page min-start / summed-len runs), not
    throw DUPLICATED_MAP_KEY from map_from_entries."""
    from docling_nlp_api_spark.operators.exports import with_page_segments

    df = spark.createDataFrame(
        [
            ("ok", [{"kind": "body", "text": t} for t in "abc"], [1, 1, 2]),
            ("bad", [{"kind": "body", "text": t} for t in "xyz"], [2, 1, 2]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string>>, span_pages array<int>",
    )
    got = {r["doc_id"]: r["_pg_map"] for r in with_page_segments(df).collect()}
    assert got["ok"][1].asDict() == {"start": 1, "len": 2}
    assert got["ok"][2].asDict() == {"start": 3, "len": 1}
    # page 2 appears in two runs ([x] at 1, [z] at 3): merged to min start
    # 1, total len 2; page 1's single run is exact
    assert got["bad"][2].asDict() == {"start": 1, "len": 2}
    assert got["bad"][1].asDict() == {"start": 2, "len": 1}
