"""Training-data text analysis: language-ID heuristic, quality scoring,
BPE-ish token counting, winnowing-style fingerprinting — first-class
pipeline ops for a 100 TB corpus (driver brief: text analysis plane).

All built-in column expressions (codegen'd); each has an exact DuckDB
oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..spec import STOPWORDS_40

# marker word lists for the n-gram/marker language heuristic — shared with
# the SQL oracle via catalog.py
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}

BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _marker_count(lang: str, text: F.Column | None = None):
    pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.size(
        F.regexp_extract_all(F.lower(text if text is not None else F.col("text")), F.lit(pat), 0)
    )


def _pred_from_scores(
    s_en: F.Column, s_de: F.Column, s_fr: F.Column, s_es: F.Column,
    has_cjk: F.Column,
) -> F.Column:
    """THE language-decision rule (CJK short-circuit -> zero-marker
    unknown -> argmax with lexicographic tiebreak de < en < es < fr),
    defined exactly once. Both lang_pred_col (exports' detect_language
    path) and lang_id build on this, so the rule cannot drift between
    the two surfaces."""
    best = F.greatest(s_en, s_de, s_fr, s_es)
    return (
        F.when(has_cjk, "zh")
        .when(best == 0, "unknown")
        .when(s_de == best, "de")
        .when(s_en == best, "en")
        .when(s_es == best, "es")
        .otherwise("fr")
    )


def lang_pred_col(text: F.Column) -> F.Column:
    """Predicted language for a text COLUMN — the marker-count argmax of
    lang_id as a reusable expression (shared with the NLP JSON's
    detect_language mode in exports.nlp_json_col)."""
    return _pred_from_scores(
        _marker_count("en", text),
        _marker_count("de", text),
        _marker_count("fr", text),
        _marker_count("es", text),
        F.size(F.regexp_extract_all(text, F.lit(r"[一-鿿]"), 0)) > 0,
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID; CJK short-circuits to zh. Deterministic
    argmax with lexicographic tiebreak."""
    scored = docs.select(
        "doc_id",
        "lang",
        _marker_count("en").alias("s_en"),
        _marker_count("de").alias("s_de"),
        _marker_count("fr").alias("s_fr"),
        _marker_count("es").alias("s_es"),
        (F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[一-鿿]"), 0)) > 0).alias("has_cjk"),
    )
    pred = _pred_from_scores(
        F.col("s_en"), F.col("s_de"), F.col("s_fr"), F.col("s_es"),
        F.col("has_cjk"),
    )
    return scored.select("doc_id", "lang", pred.alias("pred_lang"), "s_en", "s_de", "s_fr", "s_es")


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality score in [0,1]."""
    words = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\b[a-zA-Z]{3,}\b"), 0)
    n_toks = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS_40)))
    punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?,;:]"), 0))
    chars = F.length("text")
    stop_ratio = F.when(n_toks > 0, n_stop / n_toks).otherwise(F.lit(0.0))
    punct_ratio = F.when(chars > 0, punct / chars).otherwise(F.lit(0.0))
    length_score = F.least(words / F.lit(100.0), F.lit(1.0))
    score = F.round(
        0.5 * length_score + 0.3 * (1.0 - stop_ratio) + 0.2 * (1.0 - F.least(punct_ratio * 10, F.lit(1.0))),
        4,
    )
    return docs.select(
        "doc_id",
        words.alias("words"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        score.alias("quality"),
    )


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """Whitespace words + BPE-ish regex token count."""
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)).alias("bpe_tokens"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over a stride-4 sample of the
    character 8-grams of the whitespace-normalized text, plus a whole-doc
    hash. Stride sampling cuts the md5 count 4x; overlapping 8-grams at
    stride 4 still cover every byte, so any edit region moves >=1 sampled
    gram (same robustness class as winnowing with window w=4).

    Shape: the normalized text is staged ONCE per row behind an
    inline(array(struct(...))) Generate barrier — CollapseProject cannot
    inline expressions across a Generate, so the regexp_replace runs once
    per doc instead of once per gram — then the stride grams are an
    array-lambda min computed ROW-LOCALLY (array_min over transform).
    Zero shuffle, zero row expansion, one map pass.

    History of this operator's shapes (measured sf0.1 / local[32],
    interleaved best-of — BENCH/regress_ab.json): round 1 used the same
    row-local lambda but got its re-evaluation barrier from a
    repartition(doc_id) — a full-corpus exchange, wrong at 100 TB
    (0.70s). Round 2 removed the shuffle by exploding gram start
    positions into a partial-min aggregation — scale-safe but 1.7x slower
    locally (1.21s): the explode materializes a row per gram through the
    agg's hash map, where the lambda form streams grams through one
    generated loop. This form keeps both properties (0.57s, zero
    exchange): the Generate barrier costs nothing and shuffles nothing."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    base = docs.select("doc_id", F.inline(F.array(F.struct(norm.alias("nt")))))
    nt = F.col("nt")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(nt) - 7, F.lit(1)), F.lit(4)),
        lambda i: F.md5(nt.substr(i, F.lit(8))),
    )
    return base.select(
        "doc_id",
        F.array_min(grams).alias("min_gram_hash"),
        F.md5(nt).alias("doc_hash"),
    )


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, public):
    docs dominated by repeated n-grams are low-quality model fodder. Per
    doc: most-frequent-token mass and EXCESS duplicate 2-/3-gram
    fractions ((n - n_distinct)/n — the share of n-gram slots occupied
    by re-occurrences). Line-based variants are omitted: the corpus
    fixture is single-line text, and the n-gram forms subsume them.

    All row-local column math — zero shuffle, zero join, one pass; the
    token array and its sorted form are each staged ONCE behind
    inline-struct Generate barriers (the fingerprint/keywords pattern:
    CollapseProject cannot re-evaluate across a Generate, so neither the
    tokenizer nor the O(n log n) sort runs once per referencing
    subexpression). The top-token count uses the sorted-run boundary
    trick shared with exports.with_keywords: boundaries of equal-token
    runs -> run lengths -> max, entirely inside codegen'd HOFs.

    Cross-engine contract: fractions rounded to 4 decimals; guards emit
    NULL for degenerate docs (no tokens / fewer than 2 or 3 tokens)."""
    from ..spec import TOKEN_RE

    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
    base = docs.select("doc_id", F.inline(F.array(F.struct(toks.alias("toks")))))

    # NB: the gram lambda must stay single-parameter — pyspark's HOF
    # bridge counts ALL parameters (defaults included) to decide whether
    # to pass the element index, so `lambda i, n=n:` would bind the index
    # Column to n and blow up range(n).
    def _gram(n: int):
        idx = F.expr(
            f"CASE WHEN size(toks) >= {n} THEN sequence(0, size(toks) - {n}) "
            "ELSE CAST(array() AS array<int>) END"
        )
        return F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.get(F.col("toks"), i + j) for j in range(n)]),
        )

    grams = {n: _gram(n) for n in (2, 3)}
    staged = base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.inline(
            F.array(
                F.struct(
                    F.array_sort("toks").alias("srt"),
                    grams[2].alias("g2"),
                    grams[3].alias("g3"),
                )
            )
        ),
    )

    srt = F.col("srt")
    starts = _sorted_run_starts(srt)
    # run over the STAGED boundary array (_starts) — transforming the raw
    # `starts` expression here would re-evaluate the filter/transform chain
    # in the final projection and void the barrier
    bd = F.col("_starts")
    run_lens = _run_lengths(bd, F.size(srt))

    def dup_frac(col: str, minn: int):
        n = F.size(F.col(col))
        return F.when(
            F.col("n_tokens") >= minn,
            F.round((n - F.size(F.array_distinct(col))) / n, 4),
        )

    staged2 = staged.select(
        "doc_id", "n_tokens", "srt", "g2", "g3",
        F.inline(F.array(F.struct(starts.alias("_starts")))),
    )
    top_cnt = F.array_max(run_lens)
    return staged2.select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") > 0, top_cnt).alias("top_word_count"),
        F.when(F.col("n_tokens") > 0, F.round(top_cnt / F.col("n_tokens"), 4)).alias(
            "top_word_frac"
        ),
        dup_frac("g2", 2).alias("dup_2gram_frac"),
        dup_frac("g3", 3).alias("dup_3gram_frac"),
    )


def _sorted_run_starts(srt: F.Column) -> F.Column:
    """Boundary structs {i, t} of equal-token runs in a SORTED array —
    the codegen'd frequency trick shared by repetition_signals and
    filter_funnel (and, in spirit, exports.with_keywords): a token's
    count is the gap to the next run start, no groupBy needed."""
    return F.filter(
        F.transform(srt, lambda t, i: F.struct(i.alias("i"), t.alias("t"))),
        lambda s: (s["i"] == F.lit(0)) | (s["t"] != F.get(srt, s["i"] - 1)),
    )


def _run_lengths(bd: F.Column, total: F.Column) -> F.Column:
    """Run lengths from a STAGED boundary array (next start - this start;
    the last run ends at `total`)."""
    return F.transform(
        bd,
        lambda s, j: F.when(j == F.size(bd) - 1, total).otherwise(F.get(bd, j + 1)["i"])
        - s["i"],
    )


# charset signal patterns — Java ∩ RE2 subset, shared with the SQL oracle.
# Control class excludes \t \n \r (legitimate whitespace); U+FFFD is the
# UTF-8 decoder's replacement char — any count > 0 means the doc was
# mis-decoded upstream (the classic mojibake tell).
NON_ASCII_RE = r"[^\x00-\x7f]"
CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"
REPL_CHAR = "�"


def charset_signals(docs: DataFrame) -> DataFrame:
    """Per-doc encoding-health signals (the C4/CCNet charset gate): total
    chars, non-ASCII count + fraction, control-char count, and U+FFFD
    replacement-char count. Docs with ctrl/replacement hits or an
    implausible non-ASCII fraction for their claimed language get dropped
    or re-decoded upstream.

    One codegen map pass, zero shuffle — at 100 TB this fuses into
    whatever scan already reads the text (same plan shape as
    pii_signals). Counting per code point: both engines' regex and
    length() operate on code points, so counts agree exactly."""
    n_chars = F.length("text")
    n_nonascii = F.size(F.regexp_extract_all(F.col("text"), F.lit(NON_ASCII_RE), 0))
    n_ctrl = F.size(F.regexp_extract_all(F.col("text"), F.lit(CTRL_RE), 0))
    n_repl = F.size(F.regexp_extract_all(F.col("text"), F.lit(REPL_CHAR), 0))
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_seen"),
        n_nonascii.cast("long").alias("n_nonascii"),
        F.round(
            F.when(n_chars > 0, n_nonascii / n_chars).otherwise(F.lit(0.0)), 4
        ).alias("nonascii_frac"),
        n_ctrl.cast("long").alias("n_ctrl"),
        n_repl.cast("long").alias("n_replacement"),
    )


# filter-funnel gate thresholds (FineWeb-style pipeline config; shared
# verbatim with the SQL oracle in catalog.py)
GATE_MIN_WORDS = 20
GATE_TOP_WORD_FRAC = 0.20
GATE_MIN_QUALITY = 0.60


def filter_funnel(docs: DataFrame) -> DataFrame:
    """The composed quality gate a FineWeb/RefinedWeb-style pipeline runs
    per doc: ordered gates, FIRST failing gate names the drop reason —
    charset (mojibake) -> too_short -> repetition -> low_quality -> keep.
    Emits (doc_id, words, top_word_frac, quality, verdict): the verdict
    drives the keep-filter, the signal columns make the funnel auditable
    (per-reason histograms are one groupBy away, and "why did my doc
    drop" is answerable without re-running the gates).

    Single map pass, zero shuffle, zero join: every signal the individual
    operators expose (charset_signals, quality_score, the
    repetition_signals top-word mass) is recomputed as column algebra
    over TWO staged Generate barriers — the sorted token array first,
    its run boundaries second (the CollapseProject guard; sharing one
    tokenizer/sort pass across all gates is the point of composing them).
    At 100 TB this is the same plan shape as any other map-only signal:
    it fuses into the scan, and the funnel verdict column is what the
    keep-filter pushes down.

    Cross-engine contract: quality and top_word_frac rounded to 4
    decimals BEFORE threshold comparison (round-then-compare, the repo's
    float rule); token-less docs carry NULL top_word_frac, and NULL
    comparisons fall through the CASE identically in both engines."""
    from ..spec import STOPWORDS_40, TOKEN_RE

    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
    s1 = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).alias("words"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(CTRL_RE), 0)).alias("n_ctrl"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(REPL_CHAR), 0)).alias("n_repl"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?,;:]"), 0)).alias("punct"),
        F.length("text").alias("chars"),
        F.inline(F.array(F.struct(F.array_sort(toks).alias("srt")))),
    )
    srt = F.col("srt")
    s2 = s1.select(
        "doc_id",
        "words",
        "n_ctrl",
        "n_repl",
        "punct",
        "chars",
        F.size(srt).alias("n_toks"),
        F.size(F.filter(srt, lambda w: w.isin(*STOPWORDS_40))).alias("n_stop"),
        F.inline(F.array(F.struct(_sorted_run_starts(srt).alias("_starts")))),
    )

    n_toks = F.col("n_toks")
    topc = F.array_max(_run_lengths(F.col("_starts"), n_toks))
    twf = F.when(n_toks > 0, F.round(topc / n_toks, 4))
    sr = F.when(n_toks > 0, F.col("n_stop") / n_toks).otherwise(F.lit(0.0))
    pr = F.when(F.col("chars") > 0, F.col("punct") / F.col("chars")).otherwise(F.lit(0.0))
    quality = F.round(
        0.5 * F.least(F.col("words") / F.lit(100.0), F.lit(1.0))
        + 0.3 * (1.0 - sr)
        + 0.2 * (1.0 - F.least(pr * 10, F.lit(1.0))),
        4,
    )
    s3 = s2.select(
        "doc_id",
        "words",
        "n_ctrl",
        "n_repl",
        twf.alias("top_word_frac"),
        quality.alias("quality"),
    )
    verdict = (
        F.when((F.col("n_ctrl") > 0) | (F.col("n_repl") > 0), "charset")
        .when(F.col("words") < GATE_MIN_WORDS, "too_short")
        .when(F.col("top_word_frac") > GATE_TOP_WORD_FRAC, "repetition")
        .when(F.col("quality") < GATE_MIN_QUALITY, "low_quality")
        .otherwise("keep")
    )
    return s3.select(
        "doc_id", "words", "top_word_frac", "quality", verdict.alias("verdict")
    )


# Gopher quality-heuristic thresholds (Rae et al. 2021 §A1.1, public) —
# shared verbatim with the SQL oracle in catalog.py. The paper's 8
# "must contain ≥2 of" stopwords are a fixed list, distinct from the
# repo's 40-word scoring list.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOPWORDS = 2


def gopher_quality_rules(docs: DataFrame) -> DataFrame:
    """The quality-heuristic half of Gopher's §A1.1 filter set (Rae et
    al. 2021, public) — complements repetition_signals, which carries the
    repetition half: word-count bounds [50, 100k], mean word length in
    [3, 10], symbol-to-word ratio ('#' + '...') ≤ 0.1, ≥80% of words
    containing an alphabetic character, and ≥2 of the paper's 8 stopwords
    present. Line-based rules (bullet/ellipsis line fractions) are
    omitted like repetition_signals': the corpus fixture is single-line
    text and the document-level forms subsume them here.

    Emits the signal columns plus a first-fail `verdict` in the paper's
    rule order (the filter_funnel audit pattern): word_count ->
    word_length -> symbol_ratio -> alpha_words -> stopwords -> keep.

    Scale shape: one codegen map pass, zero shuffle/join — the words
    array is staged ONCE behind an inline-struct Generate barrier (the
    repo's CollapseProject guard) so the \\S+ tokenizer doesn't re-run
    per referencing signal; at 100 TB this fuses into the corpus scan
    like quality_score/charset_signals.

    Cross-engine contract: ratios rounded to 4 decimals BEFORE threshold
    comparison; word-less docs carry NULL ratios and fail word_count
    first, so the NULLs never reach a comparison."""
    words = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
    wtoks = F.regexp_extract_all(F.lower("text"), F.lit(r"\b[a-zA-Z]+\b"), 0)
    staged = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit("#"), 0)).alias("n_hash"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\.\.\."), 0)).alias(
            "n_ellipsis"
        ),
        F.inline(F.array(F.struct(words.alias("w"), wtoks.alias("wt")))),
    )
    w = F.col("w")
    n_words = F.size(w)
    mean_len = F.round(
        F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        / n_words,
        4,
    )
    symbol_ratio = F.round((F.col("n_hash") + F.col("n_ellipsis")) / n_words, 4)
    alpha_frac = F.round(
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))) / n_words, 4
    )
    n_stop = sum(
        F.array_contains(F.col("wt"), s).cast("int") for s in GOPHER_STOPWORDS
    )
    sig = staged.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.when(n_words > 0, mean_len).alias("mean_word_len"),
        F.when(n_words > 0, symbol_ratio).alias("symbol_ratio"),
        F.when(n_words > 0, alpha_frac).alias("alpha_frac"),
        n_stop.cast("long").alias("n_stopwords"),
    )
    verdict = (
        F.when(
            (F.col("n_words") < GOPHER_MIN_WORDS)
            | (F.col("n_words") > GOPHER_MAX_WORDS),
            "word_count",
        )
        .when(
            (F.col("mean_word_len") < GOPHER_MIN_MEAN_WORD_LEN)
            | (F.col("mean_word_len") > GOPHER_MAX_MEAN_WORD_LEN),
            "word_length",
        )
        .when(F.col("symbol_ratio") > GOPHER_MAX_SYMBOL_RATIO, "symbol_ratio")
        .when(F.col("alpha_frac") < GOPHER_MIN_ALPHA_FRAC, "alpha_words")
        .when(F.col("n_stopwords") < GOPHER_MIN_STOPWORDS, "stopwords")
        .otherwise("keep")
    )
    return sig.select("*", verdict.alias("verdict"))


# planted rule-violation docs for the gopher oracle — each trips exactly
# one gate (in rule order) and one passes every gate; shared as literals
# with the SQL oracle so both engines see identical bytes.
GOPHER_PLANTS = (
    (9000001, "the and that have with of " + "### ... " * 40),      # symbol_ratio
    (9000002, " ".join(["12345"] * 60)),                             # alpha_words
    (9000003, " ".join(["quantum", "flux", "vector"] * 20)),         # stopwords
    (9000004, " ".join(["a" * 20] * 60)),                            # word_length
    (9000005, "the data and that we have worked with of be " * 6),   # keep
)


# C4 line/page-cleaning constants (Raffel et al. 2020 §2.2, public) —
# shared verbatim with the SQL oracle in catalog.py.
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
C4_TERMINAL_RE = r'[.!?"]\s*$'
C4_BANNED_PHRASE = "lorem ipsum"


def c4_line_filters(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """C4's line- and page-level cleaning (Raffel et al. 2020 §2.2,
    public): retain only lines that end in terminal punctuation, have >=5
    words, and don't mention javascript; then drop pages containing a
    curly brace or "lorem ipsum", or whose retained text has <3
    sentences. The paper's external dirty-word list is out of scope (a
    third-party artifact, not an algorithm); the banned-phrase hook
    demonstrates the mechanism with the paper's own lorem-ipsum rule.

    Emits (doc_id, n_lines, n_kept_lines, n_sentences, clean_hash,
    verdict): first-fail verdict in the paper's order (brace ->
    lorem_ipsum -> too_few_sentences -> keep), clean_hash = md5 of the
    retained text so the rewrite is value-checked without shipping the
    full cleaned corpus through the comparator.

    Scale shape: one codegen map pass, zero shuffle/join — the line
    array and its retained subset are staged behind an inline-struct
    Generate barrier (the CollapseProject guard), so the line split and
    the per-line regex gates each run once per doc. At 100 TB this fuses
    into the corpus scan; the verdict column is the pushdown predicate
    for the materializing rewrite.

    Cross-engine contract: sentence count = number of [.!?]+ clusters in
    the RETAINED text; both engines split lines on chr(10) and count
    words as \\S+ runs."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike(C4_TERMINAL_RE)
        & (F.size(F.regexp_extract_all(l, F.lit(r"\S+"), 0)) >= C4_MIN_LINE_WORDS)
        & ~l.rlike("(?i)javascript"),
    )
    staged = docs.select(
        "doc_id",
        F.col(text_col).contains("{").alias("has_brace"),
        F.lower(text_col).contains(C4_BANNED_PHRASE).alias("has_banned"),
        F.inline(F.array(F.struct(lines.alias("ls"), kept.alias("ks")))),
    )
    clean = F.array_join(F.col("ks"), "\n")
    n_sent = F.size(F.regexp_extract_all(clean, F.lit(r"[.!?]+"), 0))
    sig = staged.select(
        "doc_id",
        "has_brace",
        "has_banned",
        F.size("ls").cast("long").alias("n_lines"),
        F.size("ks").cast("long").alias("n_kept_lines"),
        n_sent.cast("long").alias("n_sentences"),
        F.md5(clean).alias("clean_hash"),
    )
    verdict = (
        F.when(F.col("has_brace"), "brace")
        .when(F.col("has_banned"), "lorem_ipsum")
        .when(F.col("n_sentences") < C4_MIN_SENTENCES, "too_few_sentences")
        .otherwise("keep")
    )
    return sig.select(
        "doc_id", "n_lines", "n_kept_lines", "n_sentences", "clean_hash",
        verdict.alias("verdict"),
    )


# planted multi-line docs for the C4 oracle — the fixture corpus is
# single-line, so line-gate variety comes from these: each branch of the
# verdict plus every line gate (punct / word count / javascript) fires.
C4_PLANTS = (
    (9100001,  # keep: 3 good lines survive, 3 sentences
     "The quick brown fox jumps over the lazy dog.\n"
     "short line.\n"
     "Enable JavaScript to view this page properly today.\n"
     "A second proper sentence line stands entirely alone here!\n"
     "no terminal punctuation on this line at all\n"
     'He said the last line was "perfectly fine today."'),
    (9100002,  # too_few_sentences: only 2 lines survive the gates
     "This retained line has plenty of words inside.\n"
     "Another retained line also has enough words here."),
    (9100003,  # brace fires before line accounting
     "A valid sentence with a brace { inside it appears.\n"
     "More valid text follows on the second line here."),
    (9100004,  # lorem_ipsum page gate (case-insensitive)
     "Lorem Ipsum dolor sit amet consectetur adipiscing elit.\n"
     "This otherwise valid line would have been retained fine.\n"
     "And a third fine sentence line would have passed too."),
)


def lang_confusion(docs: DataFrame) -> DataFrame:
    """The lang-ID detector's self-evaluation: confusion matrix of
    labeled language vs marker-argmax prediction, with each cell's share
    of its TRUE language's docs (the diagonal is per-language recall —
    the same detector-evaluation pattern as dedup.lsh_recall). Emits
    (lang, pred_lang, n_docs, share_of_lang round-4).

    Scale shape: one map pass for the prediction, one groupBy on the
    (lang, pred) pair; the share window runs over the grouped frame
    (≤ |langs|² rows), never the corpus."""
    from pyspark.sql import Window

    li = lang_id(docs).select("lang", "pred_lang")
    g = li.groupBy("lang", "pred_lang").agg(F.count("*").alias("n_docs"))
    tot = F.sum("n_docs").over(Window.partitionBy("lang"))
    return g.select(
        "lang", "pred_lang", "n_docs",
        F.round(F.col("n_docs") / tot, 4).alias("share_of_lang"),
    )


# char-entropy gate thresholds — shared verbatim with the SQL oracle
ENTROPY_MIN_CHARS = 40   # gate only applies to docs long enough to judge
ENTROPY_MIN_BITS = 2.5   # natural prose sits ~3.9-4.3 bits/char; repeated
                         # filler / key-mashing collapses well below

CHAR_RE = r"(?s)."  # one code point per match, newlines included


def char_entropy(docs: DataFrame) -> DataFrame:
    """Per-doc character-level Shannon entropy (bits/char) — the
    gibberish/binary-spill gate quality pipelines run alongside the
    charset and repetition filters (a doc of one repeated character has
    entropy 0; base64 or hex spills sit far above prose): n_chars,
    distinct code points, H = log2(n) - (sum c*log2(c))/n over the char
    histogram, and a low_entropy verdict (n >= ENTROPY_MIN_CHARS and
    rounded H < ENTROPY_MIN_BITS).

    All row-local column math — zero shuffle, zero join, one codegen map
    pass that fuses into whatever scan already reads the text (same plan
    class as charset_signals). The per-doc char histogram is computed
    WITHOUT explode/groupBy via the sorted-run-boundary trick shared with
    repetition_signals: sort the char array (staged once behind an
    inline-struct Generate barrier), run starts, run lengths = counts.

    Cross-engine contract: entropy rounded to 4 decimals; the verdict
    compares the ROUNDED value so the gate can never straddle a float
    boundary between engines. Both engines' regex and counts operate on
    code points (the charset_signals precedent). Degenerate empty docs
    emit NULL entropy and a False verdict."""
    chars = F.regexp_extract_all(F.col("text"), F.lit(CHAR_RE), 0)
    staged = docs.select(
        "doc_id", F.inline(F.array(F.struct(F.array_sort(chars).alias("srt"))))
    )
    # stage the boundary array too — transforming the raw starts
    # expression downstream would re-run the filter chain per reference
    starts = _sorted_run_starts(F.col("srt"))
    staged2 = staged.select(
        "doc_id",
        F.size("srt").alias("n_chars"),
        F.inline(F.array(F.struct(starts.alias("_starts")))),
    )
    n = F.col("n_chars")
    run_lens = _run_lengths(F.col("_starts"), n)
    s = F.aggregate(
        run_lens,
        F.lit(0.0),
        lambda acc, c: acc + c.cast("double") * F.log2(c.cast("double")),
    )
    ent = F.when(n > 0, F.round(F.log2(n.cast("double")) - s / n, 4))
    return staged2.select(
        "doc_id",
        n.cast("long").alias("n_chars"),
        F.size("_starts").cast("long").alias("n_distinct_chars"),
        ent.alias("char_entropy"),
        F.coalesce(
            (n >= ENTROPY_MIN_CHARS) & (ent < ENTROPY_MIN_BITS), F.lit(False)
        ).alias("low_entropy"),
    )


# unicode normalization maps — shared verbatim with the SQL oracle.
# translate() is per-code-point in both engines, so src/dst align 1:1;
# the 1->3 ellipsis expansion goes through replace() instead.
NORM_SRC = "‘’‚“”„–—― "
NORM_DST = "'''\"\"\"--- "
NORM_ELLIPSIS = "…"

NORM_PLANT_EVERY = 10
NORM_PLANT_OFFSET = (1 << 62) + (1 << 59)  # own block in the family tiling
                                           # (dedup.PLANT_OFFSET contract:
                                           # disjoint for raw ids < 2^58)


def with_planted_unicode(docs: DataFrame) -> DataFrame:
    """Append deterministic messy-unicode variants: every 10th doc gets
    a twin wrapped in curly quotes with an em-dash/NBSP/ellipsis run and
    a control char injected — the mojibake-adjacent input normalize_text
    exists for (the base fixture is clean ASCII, so without the plant
    the op would only ever exercise its identity path)."""
    var = docs.filter(F.col("doc_id") % NORM_PLANT_EVERY == 5).select(
        (F.col("doc_id") + NORM_PLANT_OFFSET).alias("doc_id"),
        F.concat(
            F.lit("“"),
            F.regexp_replace("text", " and ", " — and… "),
            F.lit("”\x07"),
        ).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(var)


def normalize_text(docs: DataFrame) -> DataFrame:
    """Canonical text cleanup — the normalization pass every web corpus
    runs before tokenization/dedup (CCNet/C4 both start here): fold curly
    quotes and unicode dashes to ASCII, NBSP to space, ellipsis to
    '...', strip control chars (the charset_signals CTRL class), collapse
    whitespace runs, trim. Emits the normalized text, a changed flag and
    the post-norm length, so downstream exact-dedup can run on canonical
    bytes (curly-quote vs straight-quote copies of the same article md5
    to the same hash after this pass).

    One codegen map pass — translate + replace + two regexp_replace fuse
    into the scan; zero shuffle, zero join, no Python. Both engines'
    translate/replace operate per code point; \\s is the same ASCII class
    in Java and RE2; DuckDB's regexp_replace runs with the 'g' flag to
    match Spark's global default."""
    t = F.translate("text", NORM_SRC, NORM_DST)
    t = F.replace(t, F.lit(NORM_ELLIPSIS), F.lit("..."))
    t = F.regexp_replace(t, F.lit(CTRL_RE), F.lit(""))
    t = F.trim(F.regexp_replace(t, F.lit(r"\s+"), F.lit(" ")))
    return docs.select(
        "doc_id",
        t.alias("text_norm"),
        (t != F.col("text")).alias("changed"),
        F.length(t).cast("long").alias("n_chars_norm"),
    )


MIX_PLANT_EVERY = 10
MIX_PLANT_OFFSET = (1 << 62) + (1 << 58)  # own block in the family tiling
                                          # (dedup.PLANT_OFFSET contract:
                                          # disjoint for raw ids < 2^58)


MIX_DE_SENT = "der und das ist die"  # 5 German markers, 0 others
MIX_FR_SENT = "le et la les est"     # 5 French markers, 0 others


def with_planted_mixed(docs: DataFrame) -> DataFrame:
    """Append deterministic MIXED-LANGUAGE variants: every 10th doc gets
    a twin with one German and one French marker sentence appended — the
    code-switching input lang_mix exists for. (The fixture's TEXT is
    synthetic English-ish for every lang label, so concatenating
    neighbor docs — the first draft — never actually mixes; the marker
    sentences make the plant's ground truth unconditional: the twin has
    >= 2 known sentence languages whatever its base text predicts.)"""
    mixed = docs.filter(F.col("doc_id") % MIX_PLANT_EVERY == 2).select(
        (F.col("doc_id") + MIX_PLANT_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(f". {MIX_DE_SENT}. {MIX_FR_SENT}")).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(mixed)


def lang_mix(docs: DataFrame) -> DataFrame:
    """Per-SENTENCE language ID rolled up to a document code-switching
    verdict — CCNet runs its language filter at segment level precisely
    because page-level argmax (tq_lang_id) hides mixed documents, and a
    mixed doc pollutes whichever monolingual bucket wins. Per doc:
    sentence count, count of distinct KNOWN languages predicted,
    dominant language (most sentences; ties -> lexicographically
    smallest, the lang_id tie rule), its share, and is_mixed
    (>= 2 known languages).

    Scale shape: sentence explode -> per-(doc, lang) partial count ->
    per-doc rollup — two hash aggs on (doc_id[, lang]) keys carrying
    counts only; the sentence text dies inside the first map stage
    (the marker regexes are evaluated there, nothing re-tokenizes).
    Docs with zero sentences are absent by definition (same filter as
    sentence_split). Dominant via min((-count, lang)) struct — the
    argmax-with-tiebreak as one aggregate, no window."""
    from .nlp import sentence_split

    sents = sentence_split(docs)
    per = sents.select("doc_id", lang_pred_col(F.col("sentence")).alias("slang"))
    cnt = per.groupBy("doc_id", "slang").agg(F.count("*").alias("c"))
    dom = F.min(F.struct((-F.col("c")).alias("nc"), F.col("slang").alias("l")))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_sents"),
        F.sum(F.when(F.col("slang") != "unknown", 1).otherwise(0)).alias("n_langs"),
        dom.alias("d"),
    )
    return agg.select(
        "doc_id",
        F.col("n_sents").cast("long").alias("n_sents"),
        F.col("n_langs").cast("long").alias("n_langs"),
        F.col("d.l").alias("dominant_lang"),
        F.round((-F.col("d.nc")) / F.col("n_sents"), 4).alias("dominant_share"),
        (F.col("n_langs") >= 2).alias("is_mixed"),
    )


# demo policy list for the word-list gate — fixture-vocabulary placeholders
# so both verdicts occur in tests ('dup' appears in ~5% of fixture docs,
# 'forbidden' in none: an all-miss list entry must cost nothing); shared
# verbatim with the catalog.py SQL oracle. Shipping a real profanity /
# policy list is a deployment decision, not an engine semantic.
BADWORDS_DEMO = ("dup", "forbidden")


def badwords_gate(
    docs: DataFrame, words: tuple[str, ...] = BADWORDS_DEMO
) -> DataFrame:
    """C4-style word-list policy gate (Raffel et al. 2020 §2.2: C4 drops
    any page containing a word from a blocklist — the 'bad words' filter
    every public web-corpus pipeline runs). Per doc: total blocked-token
    occurrences, distinct blocked words hit, the FIRST hit in token order
    (the evidence string a review queue shows), and kept = zero hits
    (C4 semantics: a single hit drops the page).

    Tokenizer = the X3 word tokenizer (nlp.tokens_col), so the gate sees
    exactly the tokens the rest of the NLP plane sees and the DuckDB
    oracle replays it verbatim.

    Scale shape: ONE tokenize map pass; the word list is a literal array
    (the broadcast-equivalent of a tiny dim — no join, nothing crosses
    the driver) and the hit scan is a row-local higher-order filter:
    zero exchanges, zero explodes, whole-stage codegen end to end. At a
    real list size (~400 terms for the public C4 list) the literal array
    stays a few KB of plan — far below any broadcast threshold concern."""
    from .nlp import tokens_col

    hits = F.filter(tokens_col(), lambda t: t.isin(*words))
    return docs.select("doc_id", hits.alias("_h")).select(
        "doc_id",
        F.size("_h").cast("long").alias("n_hits"),
        F.size(F.array_distinct("_h")).cast("long").alias("n_distinct_hits"),
        F.get("_h", 0).alias("first_hit"),
        (F.size("_h") == 0).alias("kept"),
    )


def token_fertility(docs: DataFrame) -> DataFrame:
    """Tokenizer-efficiency report per language — the table a tokenizer
    owner reads before committing a vocabulary: BPE-ish tokens per
    whitespace word (FERTILITY — how many subwords the tokenizer spends
    per word; high fertility on a language means its text costs more
    sequence length per content) and characters per token (compression).
    Aggregated per lang over the whole corpus: doc count, word / token /
    char masses, fertility = tokens/words, chars_per_token = chars/tokens
    (both round-4, NULL-safe on empty masses).

    Scale shape: one map pass computing the three per-doc counts (the
    same regexes as tq_token_count — the report and the per-doc counter
    can never drift), then one narrow groupBy(lang) partial agg: only
    (lang, 3 longs) cross the exchange; language cardinality is O(100)."""
    t = docs.select(
        "lang",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
        .cast("long").alias("w"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
        .cast("long").alias("t"),
        F.length("text").cast("long").alias("c"),
    )
    agg = t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("w").alias("n_words"),
        F.sum("t").alias("n_tokens"),
        F.sum("c").alias("n_chars"),
    )
    return agg.select(
        "lang", "n_docs", "n_words", "n_tokens", "n_chars",
        F.round(
            F.when(F.col("n_words") > 0, F.col("n_tokens") / F.col("n_words")), 4
        ).alias("fertility"),
        F.round(
            F.when(F.col("n_tokens") > 0, F.col("n_chars") / F.col("n_tokens")), 4
        ).alias("chars_per_token"),
    )

# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
# local fingerprinting algorithm) and a Zipf rank-frequency fit: two
# corpus-QA instruments over the documents table.

WINNOW_K = 8   # gram length in chars (same gram size as fingerprint())
WINNOW_W = 4   # window width: any substring match of length >= W+K-1
               # (11 normalized chars) is guaranteed to share a fingerprint


def winnowing_fingerprints(docs: DataFrame) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, §4): slide
    a W-window over the K-gram hash sequence of the normalized text and
    select each window's MINIMUM hash (ties -> leftmost position; any
    content-determined rule matches as long as both engines pin the same
    one); the DISTINCT selected (position, hash) pairs are the doc's
    fingerprints. Guarantee: two docs sharing a normalized substring of
    length >= W + K - 1 chars share at least one fingerprint hash
    (pinned by a planted-extract pytest).

    Scale shape: one row-local HOF pass — normalize ONCE behind a
    Generate barrier, gram hashes via one transform, window minima via a
    second transform over window starts. Zero Exchange, zero Join; the
    fingerprint SET leaves the row as (digest, counts), so nothing
    doc-sized survives the projection. The O(n_grams x W) interpreted
    window scan is the right trade at W=4; a deque O(n) rolling minimum
    in the Arrow kernel is the documented upgrade path for large W.

    Docs shorter than K normalized chars have zero grams: n_fps = 0 and
    fp_digest = md5('') (the DuckDB mirror COALESCEs its NULL empty-list
    join to '' — the array_to_string([]) trap)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    base = docs.select("doc_id", F.inline(F.array(F.struct(norm.alias("nt")))))
    nt = F.col("nt")
    n_grams = F.greatest(F.length(nt) - F.lit(WINNOW_K - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
        lambda i: F.md5(nt.substr(i, F.lit(WINNOW_K))),
    )
    staged = base.select(
        "doc_id",
        n_grams.alias("n_grams"),
        F.inline(F.array(F.struct(
            F.when(n_grams > 0, grams).otherwise(F.array().cast("array<string>"))
             .alias("grams")
        ))),
    )
    g = F.col("grams")
    # window starts: 1 .. max(n_grams - W + 1, 1); short docs (< W grams)
    # get ONE window spanning all grams
    n_win = F.greatest(F.size(g) - F.lit(WINNOW_W - 1), F.lit(1))
    win = lambda j: F.slice(g, j, F.lit(WINNOW_W))  # noqa: E731 (clipped at end)
    selected = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda j: F.concat_ws(
            ":",
            (j + F.array_position(win(j), F.array_min(win(j))) - F.lit(2)).cast("string"),
            F.array_min(win(j)),
        ),
    )
    fps = F.when(F.size(g) > 0, F.array_sort(F.array_distinct(selected))).otherwise(
        F.array().cast("array<string>")
    )
    return staged.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.size(fps).cast("long").alias("n_fingerprints"),
        F.md5(F.concat_ws("|", fps)).alias("fp_digest"),
    )


ZIPF_TOP_N = 1000  # rank-frequency fit over the top-N corpus words


def zipf_fit(docs: DataFrame) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: least-squares
    slope of ln(freq) on ln(rank) for the top-N words (Zipf's law
    predicts slope ~= -1 for natural text; strong deviation flags
    boilerplate-dominated or synthetic corpora — a one-row corpus QA
    gauge alongside the per-doc quality gates).

    Scale shape: tokenize -> hash-agg word counts (the one corpus-wide
    exchange, shared shape with corpus_keywords) -> top-N via
    TakeOrderedAndProject (never a global sort) -> the regression runs
    over N=1000 rows: rank window + covar_pop/var_pop/corr aggregates,
    all bounded by N regardless of corpus size.

    Cross-engine contract (round-5 FXP hardening): ranks pinned by
    (cnt DESC, word ASC); ln(rank)/ln(cnt) quantize to micro-unit BIGINT
    and the five regression sums (Sx Sy Sxy Sxx Syy) accumulate as
    integers — order-free, so the fit is invariant under any partition
    layout (covar_pop/var_pop over doubles were not: the merge order of
    the 1000 rows across partitions perturbed the ~1e-12 tail, a latent
    round-4-boundary flake). The slope/intercept/pearson scalars are then
    ONE identical double expression over identical integers in both
    engines; round-4 final. NULL parity on degenerate input: DuckDB
    float division by zero yields NULL, mirrored by try_divide; the
    pearson denominator is guarded (varx*vary > 0) both sides because a
    zero-variance corpus can cancel to a tiny negative."""
    from pyspark.sql import Window

    from .nlp import tokens_col
    from .sampling import FXP, fxp_q

    counts = (
        docs.select(F.explode(tokens_col()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    topn = counts.orderBy(F.desc("cnt"), F.asc("word")).limit(ZIPF_TOP_N)
    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    ranked = topn.withColumn("rank", F.row_number().over(w)).select(
        fxp_q(F.log("rank")).alias("xq"), fxp_q(F.log("cnt")).alias("yq")
    )
    sums = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
        F.sum(F.col("yq") * F.col("yq")).alias("syy"),
    )
    # scalar double math over the 1-row integer sums — written with the
    # exact same operand grouping as the SQL oracle so both engines
    # evaluate the identical IEEE expression
    nf = F.col("n") * F.lit(float(FXP))
    nf2 = F.col("n") * F.lit(float(FXP) * FXP)
    mx = F.col("sx") / nf
    my = F.col("sy") / nf
    cov = F.col("sxy") / nf2 - mx * my
    varx = F.col("sxx") / nf2 - mx * mx
    vary = F.col("syy") / nf2 - my * my
    slope = F.try_divide(cov, varx)
    pearson = F.when(varx * vary > 0, cov / F.sqrt(varx * vary))
    return sums.select(
        F.col("n").alias("n_ranked"),
        F.round(slope, 4).alias("slope"),
        F.round(my - slope * mx, 4).alias("intercept"),
        F.round(pearson, 4).alias("pearson_r"),
    )
