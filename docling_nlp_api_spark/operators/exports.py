"""Render/export sinks S4-S8 (SURVEY.md §2.1, SPEC.md §5) over the
EXTRACTED table — pure built-in column functions (transform / filter /
array_join / to_json), zero Python UDFs, so the whole render stays inside
whole-stage codegen.

Reference behavior anchors: export_to_{markdown,html,text,doctags}
(/root/reference/app/services/docling_service.py:169-189) and the NLP
structured JSON (:221-374).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MEDIA = ("image", "table")


def _is_text(x: Column) -> Column:
    return ~x["kind"].isin(*_MEDIA)


def full_text_col(spans: Column) -> Column:
    """S6: content text spans joined in reading order with newlines."""
    return F.array_join(F.transform(F.filter(spans, _is_text), lambda x: x["text"]), "\n")


def markdown_col(spans: Column) -> Column:
    """S4 (SPEC §5)."""

    def render(x: Column) -> Column:
        k = x["kind"]
        return (
            F.when(k.isin("h1", "title"), F.concat(F.lit("# "), x["text"]))
            .when(k.isin("h2", "heading"), F.concat(F.lit("## "), x["text"]))
            .when(k == "h3", F.concat(F.lit("### "), x["text"]))
            .when(k == "li", F.concat(F.lit("- "), x["text"]))
            .when(k == "image", F.concat(F.lit("![image]("), x["media_ref"], F.lit(")")))
            .when(k == "table", F.concat(F.lit("[table "), x["media_ref"], F.lit("] "), x["text"]))
            .when(k == "caption", F.concat(F.lit("*"), x["text"], F.lit("*")))
            .otherwise(x["text"])
        )

    return F.array_join(F.transform(spans, render), "\n\n")


def html_col(spans: Column) -> Column:
    """S5 (SPEC §5)."""

    def render(x: Column) -> Column:
        k = x["kind"]
        return (
            F.when(k.isin("h1", "title"), F.format_string("<h1>%s</h1>", x["text"]))
            .when(k.isin("h2", "heading"), F.format_string("<h2>%s</h2>", x["text"]))
            .when(k == "h3", F.format_string("<h3>%s</h3>", x["text"]))
            .when(k == "li", F.format_string("<li>%s</li>", x["text"]))
            .when(k == "caption", F.format_string("<figcaption>%s</figcaption>", x["text"]))
            .when(k == "image", F.format_string('<img src="%s"/>', x["media_ref"]))
            .when(k == "table", F.format_string('<table data-ref="%s">%s</table>', x["media_ref"], x["text"]))
            .otherwise(F.format_string("<p>%s</p>", x["text"]))
        )

    return F.array_join(F.transform(spans, render), "\n")


def doctags_col(spans: Column) -> Column:
    """S7: <kind loc="order">payload</kind>."""

    def render(x: Column) -> Column:
        payload = F.when(x["kind"].isin(*_MEDIA), x["media_ref"]).otherwise(x["text"])
        return F.format_string('<%s loc="%d">%s</%s>', x["kind"], x["order"], payload, x["kind"])

    return F.array_join(F.transform(spans, render), "\n")


def paragraphs_col(full_text: Column) -> Column:
    """X1: split on blank lines, trim, drop empties."""
    return F.filter(
        F.transform(F.split(full_text, r"\n\n"), lambda p: F.trim(p)),
        lambda p: p != "",
    )


def sentences_col(paragraphs: Column) -> Column:
    """X2: per paragraph split on [.!?]+, trim, drop empties; flattened."""
    return F.flatten(
        F.transform(
            paragraphs,
            lambda p: F.filter(
                F.transform(F.split(p, r"[.!?]+"), lambda s: F.trim(s)),
                lambda s: s != "",
            ),
        )
    )


def nlp_json_col(spans: Column, metadata: Column) -> Column:
    """S8: structured NLP JSON (document_info / content)."""
    ft = full_text_col(spans)
    paras = paragraphs_col(ft)
    return F.to_json(
        F.struct(
            F.struct(
                metadata["word_count"].cast("long").alias("word_count"),
                metadata["char_count"].cast("long").alias("char_count"),
                (metadata["has_images"] == "true").alias("has_images"),
                (metadata["has_tables"] == "true").alias("has_tables"),
                F.size(spans).alias("span_count"),
            ).alias("document_info"),
            F.struct(
                ft.alias("full_text"),
                paras.alias("paragraphs"),
                sentences_col(paras).alias("sentences"),
            ).alias("content"),
        )
    )


def with_exports(extracted: DataFrame, formats: tuple[str, ...] = ("text", "markdown", "html", "doctags", "json")) -> DataFrame:
    """Attach requested export columns to an EXTRACTED-shaped DataFrame."""
    s = F.col("spans")
    out = extracted
    if "text" in formats:
        out = out.withColumn("export_text", full_text_col(s))
    if "markdown" in formats:
        out = out.withColumn("export_markdown", markdown_col(s))
    if "html" in formats:
        out = out.withColumn("export_html", html_col(s))
    if "doctags" in formats:
        out = out.withColumn("export_doctags", doctags_col(s))
    if "json" in formats:
        out = out.withColumn("export_json", nlp_json_col(s, F.col("metadata")))
    return out
