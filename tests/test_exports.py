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
    assert obj["document_info"]["word_count"] == int(row["metadata"]["word_count"])
    assert obj["document_info"]["has_images"] is True
    # spans join with single \n, so only the explicit \n\n inside span 5
    # creates a paragraph boundary (SPEC §6)
    assert len(obj["content"]["paragraphs"]) == 2
    assert obj["content"]["sentences"][-1] == "and three"
