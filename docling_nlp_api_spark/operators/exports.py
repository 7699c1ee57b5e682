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

from ..spec import MEDIA_KINDS

# single-sourced from spec so the render plane cannot drift from the
# kernels' media vocabulary
_MEDIA = tuple(sorted(MEDIA_KINDS))


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


# Python str.strip()/str.split() whitespace as a Java regex class: ASCII
# \s plus FS/GS/RS/US (\x1c-\x1f — Python-space, but outside EVERY
# engine's \s) and the Unicode White_Space set (NEL, NBSP, U+1680,
# U+2000-200A, LS, PS, NNBSP, MMSP, ideographic space). The S8 JSON
# plane is pinned against the PYTHON oracle (oracle/exports.py), whose
# .strip()/.split() use exactly this set — an ASCII-only btrim/\s+ left
# NBSP-prefixed paragraphs and their word counts divergent.
_PYWS = (
    "[\\s\\u001C-\\u001F\\u0085\\u00A0\\u1680\\u2000-\\u200A"
    "\\u2028\\u2029\\u202F\\u205F\\u3000]"
)


def _strip(c: Column) -> Column:
    """Python str.strip() semantics: F.trim removes SPACES only, but the
    reference strips all whitespace (docling_service.py:286,301) — a
    sentence that starts at a span boundary would otherwise keep its
    leading newline."""
    return F.regexp_replace(
        F.regexp_replace(c, f"^{_PYWS}+", ""), f"{_PYWS}+$", ""
    )


def paragraphs_col(full_text: Column) -> Column:
    """X1: split on blank lines, strip, drop empties."""
    return F.filter(
        F.transform(F.split(full_text, r"\n\n"), _strip),
        lambda p: p != "",
    )


def sentences_col(paragraphs: Column) -> Column:
    """X2: per paragraph split on [.!?]+, strip, drop empties; flattened."""
    return F.flatten(
        F.transform(
            paragraphs,
            lambda p: F.filter(
                F.transform(F.split(p, r"[.!?]+"), _strip),
                lambda s: s != "",
            ),
        )
    )


def _counted(arr: Column) -> Column:
    """[{id, text, word_count, char_count}] objects from a string array —
    the reference's paragraph/sentence objects (docling_service.py:285-308).
    Elements are _strip-ed (Python-space) and non-empty, so splitting on
    Python-space runs counts words exactly like Python's str.split()."""
    return F.transform(
        arr,
        lambda p, i: F.struct(
            i.alias("id"),
            p.alias("text"),
            F.size(F.split(p, _PYWS + "+")).alias("word_count"),
            F.length(p).alias("char_count"),
        ),
    )


def _headings(spans: Column) -> Column:
    """structure.headings: [{id, level, text}] from heading-kind spans.
    (The reference declares this key but never populates it —
    docling_service.py:246,249; the span model can, so we do.)"""
    hs = F.filter(spans, lambda x: x["kind"].isin("h1", "title", "h2", "heading", "h3"))
    return F.transform(
        hs,
        lambda x, i: F.struct(
            i.alias("id"),
            F.when(x["kind"].isin("h1", "title"), 1)
            .when(x["kind"].isin("h2", "heading"), 2)
            .otherwise(3)
            .alias("level"),
            x["text"].alias("text"),
        ),
    )


def _lists(spans: Column) -> Column:
    """structure.lists: [{id, text}] from li spans (ref declares, never
    fills — same note as _headings)."""
    return F.transform(
        F.filter(spans, lambda x: x["kind"] == "li"),
        lambda x, i: F.struct(i.alias("id"), x["text"].alias("text")),
    )


def _tables(spans: Column) -> Column:
    """structure.tables: [{id, rows, columns, cell_count, media_ref}] —
    the reference's table objects (docling_service.py:311-325) carry empty
    rows/columns and cell_count 0 plus the raw table payload; our raw
    anchor is the media_ref."""
    return F.transform(
        F.filter(spans, lambda x: x["kind"] == "table"),
        lambda x, i: F.struct(
            i.alias("id"),
            F.array().cast("array<string>").alias("rows"),
            F.array().cast("array<string>").alias("columns"),
            F.lit(0).alias("cell_count"),
            x["media_ref"].alias("media_ref"),
        ),
    )


def _images(spans: Column) -> Column:
    """structure.images: [{id, type, metadata{media_ref}}]
    (docling_service.py:328-335)."""
    return F.transform(
        F.filter(spans, lambda x: x["kind"] == "image"),
        lambda x, i: F.struct(
            i.alias("id"),
            F.lit("image").alias("type"),
            F.struct(x["media_ref"].alias("media_ref")).alias("metadata"),
        ),
    )


_PAGE_DDL = (
    "array<struct<page_number:int,text:string,"
    "elements:array<struct<type:string,content:string,bbox:array<double>>>,"
    "bounding_boxes:array<double>>>"
)
_ELEM_DDL = "array<struct<type:string,content:string,bbox:array<double>>>"


def with_page_segments(df: DataFrame) -> DataFrame:
    """Stage the page model for the JSON render: per-span page numbers are
    NONDECREASING within a doc (cumulative pageno markers), so each page's
    spans form one contiguous range. A naive per-page filter is
    O(pages x spans) per doc — a 30k-span/1k-page mega PDF costs 3e7 span
    visits for ONE row (measured 110s -> 13.5s for the 2k-doc render when
    removed). Instead: one boundary pass over the zipped spans, then a
    page -> (start, len) map; each page is a slice. O(spans + pages).

    Stages materialize behind inline(array(struct(...))) Generates — the
    same CollapseProject re-evaluation guard as with_keywords.

    Robustness (ADVICE r2): if a kernel ever violates the nondecreasing
    invariant, a page appears in >1 run and map_from_entries would throw
    (mapKeyDedupPolicy defaults to EXCEPTION). The run list is checked
    with one O(runs) array_distinct; only when duplicates actually exist
    does an O(runs^2) per-page merge (min start, summed len) kick in, so
    out-of-order input degrades to approximate page slices instead of
    crashing while the invariant-holding path keeps its O(spans + pages)
    cost."""
    has_bb = "span_bboxes" in df.columns
    zip_cols = [F.col("spans").alias("s"), F.col("span_pages").alias("p")]
    if has_bb:
        zip_cols.append(F.col("span_bboxes").alias("b"))
    z = F.arrays_zip(*zip_cols)
    zf = F.transform(
        F.filter(z, lambda e: ~e["s"]["kind"].isin(*_MEDIA)),
        lambda e: F.struct(
            e["s"]["text"].alias("t"),
            e["p"].alias("p"),
            (e["b"] if has_bb else F.lit(None).cast("array<double>")).alias("bb"),
        ),
    )
    df1 = df.select("*", F.inline(F.array(F.struct(zf.alias("_pg_z")))))

    zc = F.col("_pg_z")
    bnd = F.filter(
        F.transform(zc, lambda e, i: F.struct(e["p"].alias("p"), i.alias("i"))),
        lambda x: (x["i"] == F.lit(0)) | (x["p"] != F.get(zc, x["i"] - 1)["p"]),
    )
    df2 = df1.select("*", F.inline(F.array(F.struct(bnd.alias("_pg_bnd")))))

    bc = F.col("_pg_bnd")
    runs = F.transform(
        bc,
        lambda b, j: F.struct(
            b["p"].alias("p"),
            F.struct(
                (b["i"] + 1).alias("start"),  # 1-based for F.slice
                (
                    F.when(j == F.size(bc) - 1, F.size(zc)).otherwise(
                        F.get(bc, j + 1)["i"]
                    )
                    - b["i"]
                ).alias("len"),
            ).alias("seg"),
        ),
    )
    df3 = df2.select("*", F.inline(F.array(F.struct(runs.alias("_pg_runs"))))).drop(
        "_pg_bnd"
    )

    rc = F.col("_pg_runs")
    ps = F.transform(rc, lambda r: r["p"])
    merged = F.transform(
        F.array_distinct(ps),
        lambda p: F.struct(
            p.alias("p"),
            F.struct(
                F.array_min(
                    F.transform(F.filter(rc, lambda r: r["p"] == p), lambda r: r["seg"]["start"])
                ).alias("start"),
                F.aggregate(
                    F.filter(rc, lambda r: r["p"] == p),
                    F.lit(0),
                    lambda acc, r: acc + r["seg"]["len"],
                ).alias("len"),
            ).alias("seg"),
        ),
    )
    seg_map = F.map_from_entries(
        F.when(F.size(F.array_distinct(ps)) == F.size(ps), rc).otherwise(merged)
    )
    return df3.select("*", F.inline(F.array(F.struct(seg_map.alias("_pg_map"))))).drop(
        "_pg_runs"
    )


def _pages_col(page_count: Column) -> Column:
    """pages[]: {page_number, text, elements[], bounding_boxes[]}
    (docling_service.py:253-279) over the staged `_pg_z`/`_pg_map`
    columns (see with_page_segments). Docs without a page model
    (HTML/plain) emit [] exactly like the reference does when docling
    returns no pages. text = each non-media span's text + ' ' (the
    reference appends a trailing space per element). elements[].bbox is
    the span's layout box when the source supplied one, else [] —
    text_elem.get('bbox', []) at docling_service.py:276; pages[].
    bounding_boxes stays [] because the reference initializes it and
    never fills it (docling_service.py:260, verified no other write)."""
    zc = F.col("_pg_z")

    def page_obj(pno: Column) -> Column:
        seg = F.element_at(F.col("_pg_map"), pno)
        on_page = F.slice(zc, seg["start"], seg["len"])
        return F.struct(
            pno.alias("page_number"),
            F.when(
                seg.isNotNull(),
                F.concat(F.array_join(F.transform(on_page, lambda e: e["t"]), " "), F.lit(" ")),
            )
            .otherwise(F.lit(""))
            .alias("text"),
            F.when(
                seg.isNotNull(),
                F.transform(
                    on_page,
                    lambda e: F.struct(
                        F.lit("text").alias("type"),
                        e["t"].alias("content"),
                        # reference: text_elem.get('bbox', []) — a span
                        # without geometry renders [] (docling_service.py:276)
                        F.coalesce(e["bb"], F.array().cast("array<double>")).alias("bbox"),
                    ),
                ),
            )
            .otherwise(F.expr(f"CAST(array() AS {_ELEM_DDL})"))
            .alias("elements"),
            F.array().cast("array<double>").alias("bounding_boxes"),
        )

    return F.when(
        page_count > 0,
        F.transform(F.sequence(F.lit(1), page_count.cast("int")), page_obj),
    ).otherwise(F.expr(f"CAST(array() AS {_PAGE_DDL})"))


def with_keywords(df: DataFrame, text_col: str = "export_text", k: int = 20) -> DataFrame:
    """Add a `keywords` column: per-doc top-k keyword objects
    {word, frequency, score=frequency/total_tokens}, the reference's
    frequency-based extraction (docling_service.py:338-360). Ties pinned by
    word asc (the reference's Counter.most_common insertion order is not
    deterministic across engines).

    Keyword extraction is a PER-ROW computation (each doc ranks only its
    own tokens), so it compiles to a chain of JVM higher-order functions
    with ZERO shuffle and ZERO join — the earlier draft's
    explode -> groupBy -> window -> join-back shape re-ran the upstream
    extraction subtree on both join sides and moved every token over the
    wire twice. Counting runs in O(tokens): sort the filtered tokens, find
    distinct-run boundaries, diff consecutive boundary indices.

    Each stage is materialized behind an `inline(array(struct(...)))`
    Generate barrier: CollapseProject would otherwise inline the tokenizer
    regex / O(n log n) sort into every lambda that references it (the same
    re-evaluation trap measured at 24x in dedup.with_shingles)."""
    from ..spec import STOPWORDS_40, TOKEN_RE

    # stage 1: tokenize once
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    df1 = df.select("*", F.inline(F.array(F.struct(toks.alias("_kw_toks")))))

    # stage 2: total (pre-stopword, the score denominator) + sorted kept tokens
    kept = F.array_sort(F.filter(F.col("_kw_toks"), lambda t: ~t.isin(*STOPWORDS_40)))
    df2 = df1.select(
        "*",
        F.inline(F.array(F.struct(
            F.size("_kw_toks").alias("_kw_total"), kept.alias("_kw_srt"),
        ))),
    ).drop("_kw_toks")

    # stage 3: distinct-run boundaries {t, i} over the sorted array
    # (F.get is 0-based and null-safe: i=0 compares against null -> false,
    # but the i==0 arm already admits the first element)
    srt = F.col("_kw_srt")
    bnd = F.filter(
        F.transform(srt, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: (s["i"] == F.lit(0)) | (s["t"] != F.get(srt, s["i"] - 1)),
    )
    df3 = df2.select("*", F.inline(F.array(F.struct(bnd.alias("_kw_bnd")))))

    # stage 4: frequency = next boundary index - this one; rank by
    # (freq desc, word asc) via array_sort on (-freq, word); top-k; score
    bd = F.col("_kw_bnd")
    counts = F.transform(
        bd,
        lambda s, j: F.struct(
            (
                s["i"]
                - F.when(j == F.size(bd) - 1, F.size(srt)).otherwise(F.get(bd, j + 1)["i"])
            ).alias("nf"),
            s["t"].alias("word"),
        ),
    )
    kw = F.transform(
        F.slice(F.array_sort(counts), 1, k),
        lambda s: F.struct(
            s["word"].alias("word"),
            (-s["nf"]).cast("long").alias("frequency"),
            F.round((-s["nf"]) / F.col("_kw_total"), 6).alias("score"),
        ),
    )
    return df3.withColumn("keywords", kw).drop("_kw_total", "_kw_srt", "_kw_bnd")


def nlp_json_col(
    spans: Column, metadata: Column, keywords: Column, language: Column | None = None
) -> Column:
    """S8: the reference's full structured NLP JSON
    (docling_service.py:221-374): document_info / content (paragraphs,
    sentences, entities, keywords) / structure (headings, tables, lists,
    images) / pages. Reads the staged `_js_ft`/`_js_paras`/`_js_sents`
    (with_exports) and `_pg_z`/`_pg_map` (with_page_segments) attribute
    columns — full text is rendered once and paragraphs split once per
    row, instead of once per referencing subexpression."""
    page_count = metadata["page_count"].cast("long")
    return F.to_json(
        F.struct(
            F.struct(
                page_count.alias("total_pages"),
                metadata["word_count"].cast("long").alias("total_words"),
                metadata["char_count"].cast("long").alias("total_characters"),
                (metadata["has_tables"] == "true").alias("has_tables"),
                (metadata["has_images"] == "true").alias("has_images"),
                # reference parity: docling_service.py:236 hardcodes "en";
                # detect_language=True swaps in the lang_id marker argmax
                (language if language is not None else F.lit("en")).alias("language"),
            ).alias("document_info"),
            F.struct(
                F.col("_js_ft").alias("full_text"),
                _counted(F.col("_js_paras")).alias("paragraphs"),
                _counted(F.col("_js_sents")).alias("sentences"),
                F.array().cast("array<string>").alias("entities"),
                keywords.alias("keywords"),
            ).alias("content"),
            F.struct(
                _headings(spans).alias("headings"),
                _tables(spans).alias("tables"),
                _lists(spans).alias("lists"),
                _images(spans).alias("images"),
            ).alias("structure"),
            _pages_col(page_count).alias("pages"),
        )
    )


def with_exports(
    extracted: DataFrame,
    formats: tuple[str, ...] = ("text", "markdown", "html", "doctags", "json"),
    detect_language: bool = False,
) -> DataFrame:
    """Attach requested export columns to an EXTRACTED-shaped DataFrame.

    All renders — keywords included — are built-in column functions over
    the row itself: the whole export plane is embarrassingly parallel,
    zero shuffle, zero join, one pass over the extracted table.

    detect_language=False (default) keeps reference parity — the JSON's
    document_info.language is the hardcoded "en" of docling_service.py:236.
    True swaps in textquality's marker-argmax language ID over the
    rendered full text (staged once behind the Generate barrier)."""
    s = F.col("spans")
    out = extracted
    if "text" in formats or "json" in formats:
        out = out.withColumn("export_text", full_text_col(s))
    if "markdown" in formats:
        out = out.withColumn("export_markdown", markdown_col(s))
    if "html" in formats:
        out = out.withColumn("export_html", html_col(s))
    if "doctags" in formats:
        out = out.withColumn("export_doctags", doctags_col(s))
    if "json" in formats:
        out = with_keywords(out)
        # stage full text + paragraph/sentence splits once per row (the
        # json struct references each several times; CollapseProject
        # would otherwise re-render/re-split per reference)
        ft = F.col("export_text")
        out = out.select(
            "*",
            F.inline(F.array(F.struct(
                ft.alias("_js_ft"), paragraphs_col(ft).alias("_js_paras"),
            ))),
        )
        lang_fields = []
        if detect_language:
            from .textquality import lang_pred_col

            lang_fields = [lang_pred_col(F.col("_js_ft")).alias("_js_lang")]
        out = out.select(
            "*",
            F.inline(F.array(F.struct(
                sentences_col(F.col("_js_paras")).alias("_js_sents"),
                *lang_fields,
            ))),
        )
        out = with_page_segments(out)
        out = out.withColumn(
            "export_json",
            nlp_json_col(
                s, F.col("metadata"), F.col("keywords"),
                language=F.col("_js_lang") if detect_language else None,
            ),
        ).drop("keywords", "_js_ft", "_js_paras", "_js_sents", "_pg_z", "_pg_map")
        if detect_language:
            out = out.drop("_js_lang")
        if "text" not in formats:
            out = out.drop("export_text")
    return out
