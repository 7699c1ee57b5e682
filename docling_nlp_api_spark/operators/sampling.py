"""Corpus sampling / split / mixing plane — the ops a training-data
pipeline runs AFTER dedup and quality filtering to assemble the actual
training mix (driver brief: large-scale training-data pipeline ops).

Everything here is DETERMINISTIC hash bucketing, never rand(): at
10^12 docs a sample must be reproducible across reruns, stable under
re-partitioning, and joinable back to its source (the same doc always
lands in the same split). md5-derived buckets give all three and are
bit-identical in the DuckDB oracles; `rand(seed)` is neither
engine-portable nor row-stable under repartition.

Scale notes: every op is a narrow map pass (doc_id + a few int columns)
followed by at most one partial-agg — no shuffle of text, no window, no
driver-side sampling state. The mixing-rate table is a handful of rows,
inlined as literals (a broadcast join degenerates to a CASE)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPLIT_SALT = "split:v1"     # versioned salt -> resampling = bump the salt
VAL_PCT = 5                 # val = 5% of the corpus
TEST_PCT = 5                # test = next 5%

# per-language mixing rates (a training-mix config: keep-fraction of each
# language's docs, in percent) — deliberately uneven to exercise the op
MIX_RATES_PCT = {"en": 100, "de": 60, "fr": 60, "es": 40, "zh": 25}
MIX_DEFAULT_PCT = 10        # languages outside the config keep 10%
MIX_SALT = "mix:v1"


def _bucket(salt: str, key: F.Column) -> F.Column:
    """Deterministic bucket in [0, 100): first 4 hex digits of
    md5(salt || key) mod 100 — uniform enough for split/mix rates at any
    corpus size, identical arithmetic in DuckDB (conv/hex parity is the
    same trick the dedup plane pins)."""
    hx = F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 4)
    return (F.conv(hx, 16, 10).cast("long") % 100).alias("bucket")


def with_split(docs: DataFrame, val_pct: int = VAL_PCT, test_pct: int = TEST_PCT) -> DataFrame:
    """Assign every doc a stable train/val/test split: bucket < val_pct
    -> val, next test_pct -> test, rest train. Adding corpus later never
    moves an existing doc between splits (the bucket depends only on
    doc_id + salt)."""
    b = _bucket(SPLIT_SALT, F.col("doc_id"))
    split = (
        F.when(b < val_pct, "val")
        .when(b < val_pct + test_pct, "test")
        .otherwise("train")
    )
    return docs.withColumn("split", split)


def split_summary(docs: DataFrame) -> DataFrame:
    """Split sizes + word mass per split (the sanity table every
    training run prints). One narrow agg; text never shuffles — the
    word count is computed in the map stage."""
    words = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    return (
        with_split(docs)
        .select("split", words.alias("w"))
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("w").alias("n_words"))
    )


def mixed_corpus(docs: DataFrame) -> DataFrame:
    """Language-stratified downsampling: keep a doc iff its mix bucket <
    its language's configured rate. Deterministic, one filter pass."""
    b = _bucket(MIX_SALT, F.col("doc_id"))
    rate = F.lit(MIX_DEFAULT_PCT)
    for lang, pct in sorted(MIX_RATES_PCT.items()):
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    return docs.filter(b < rate)


def mix_summary(docs: DataFrame) -> DataFrame:
    """Per-language kept/total counts + realized keep rate after
    mixed_corpus — the mixing report. Computed in ONE pass over the
    corpus (conditional agg on the keep predicate), not a self-join of
    kept against total."""
    b = _bucket(MIX_SALT, F.col("doc_id"))
    rate = F.lit(MIX_DEFAULT_PCT)
    for lang, pct in sorted(MIX_RATES_PCT.items()):
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    kept = (b < rate).cast("long")
    return (
        docs.select("lang", kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("kept").alias("n_kept"),
            F.round(F.sum("kept") / F.count("*"), 4).alias("keep_rate"),
        )
    )


def temperature_weights(docs: DataFrame) -> DataFrame:
    """Multilingual temperature-sampling weights (XLM-R / mT5 recipe,
    public): upweight low-resource languages by sampling language l with
    probability proportional to p_l^alpha instead of its corpus share
    p_l. alpha is pinned to 0.5 so the exponent is sqrt() — IEEE-754
    sqrt is CORRECTLY ROUNDED (unlike pow), which makes the weights
    bit-identical in the DuckDB oracle with no epsilon contract.

    Emits per language: doc count, corpus share p, and the normalized
    temperature weight w = sqrt(n_l) / sum_l sqrt(n_l)  (equal to
    p^0.5 / sum p^0.5 — the 1/sqrt(N) factors cancel).

    Scale: one narrow groupBy(lang) — language cardinality is O(100) —
    then a broadcast of the one-row total; the corpus text never leaves
    the scan projection."""
    per_lang = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tot = per_lang.agg(
        F.sum("n_docs").alias("total"),
        F.sum(F.sqrt("n_docs")).alias("qsum"),
    )
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.round(F.col("n_docs") / F.col("total"), 6).alias("p_share"),
        F.round(F.sqrt("n_docs") / F.col("qsum"), 6).alias("temp_weight"),
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Unigram-LM quality score: mean -ln p(token) per doc under the
    corpus's OWN unigram distribution (the classic cheap LM filter — docs
    of rare/garbage tokens score high, fluent text low).

    Two aggregations and one equi-join on the token string:
      1. corpus pass: (word, count) + total token mass — vocabulary-sized
         output (Zipf: ~sqrt of corpus mass), NOT corpus-sized;
      2. per-doc token stream joins the frequency table (at 100 TB the
         vocab table is a few GB: either a shuffle-join on word — both
         sides narrow — or a broadcast once it is pruned to the top-k
         vocab that covers 99.9% of mass);
      3. per-doc partial agg of -ln(cnt/total).
    No OOV handling needed: the vocabulary is built from the same corpus.
    ln parity: both engines bind IEEE double ln; the result is rounded to
    4 decimals (the dedup plane's cross-engine float contract)."""
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z0-9]+"), 0)).alias("word"),
    )
    freqs = toks.groupBy("word").agg(F.count("*").alias("cnt"))
    total = freqs.agg(F.sum("cnt").alias("total"))
    scored = (
        toks.join(freqs, "word")
        .crossJoin(F.broadcast(total))
        .select("doc_id", (-F.log(F.col("cnt") / F.col("total"))).alias("nll"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("nll"), 4).alias("mean_nll"),
        )
    )
