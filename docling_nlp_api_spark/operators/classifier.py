"""Model-based classification plane: a multinomial Naive Bayes text
classifier trained AND applied distributed — the "model-based quality
filter" step of a training-data pipeline (CCNet's fastText language ID,
the GPT-3/LLaMA quality classifier) expressed as pure DataFrame algebra.

The reference hardcodes language detection to "en"
(/root/reference/app/services/docling_service.py:236) and has no trained
model anywhere; this plane supplies what a 100 TB corpus actually needs:
a classifier whose TRAINING is a corpus aggregation and whose INFERENCE
is a broadcast-model join — no MLlib, no driver-side fit, no Python UDF.

Why Naive Bayes (and not logistic regression / fastText embeddings):
- training is ONE groupBy: class-conditional token counts. The model is
  the (class, word, count) table — vocabulary-sized (Zipf: ~sqrt of
  corpus mass), never corpus-sized, so it broadcasts;
- inference is exact integer counts pushed through ln() — the only
  floats are IEEE-double ln/sum, which both engines bind identically, so
  an EXACT cross-engine oracle exists (same contract as
  sampling.unigram_logprob); an SGD-trained model would need the
  driver-loop machinery kmeans_fit already demonstrates without gaining
  oracle precision;
- at small vocabularies NB is literally a linear model over one-hot
  token counts — the same hypothesis class fastText's supervised mode
  optimizes, with closed-form (counting) training.

Scale shape (10^12 docs):
  1. token pass -> per-doc word counts (doc_id, word, k): map-side
     partial agg, shuffle keyed on (doc_id, word) — narrow rows;
  2. model: class counts (lang, word, c) + class totals — both
     vocabulary-sized, broadcast;
  3. scoring: word-count stream x |classes| fan-out (a handful), joined
     against the broadcast model, partial-agg per (doc, class), then a
     per-doc argmax window over |classes| rows/doc.
  The corpus text crosses an exchange exactly once (step 1); everything
  model-sized stays broadcast.

Numeric contract (cross-engine exactness): scores are
  sum_w k_w * ln(c_wc + 1)  -  n_d * ln(tot_c + V)  +  ln(nd_c / nd)
with add-1 (Laplace) smoothing over the GLOBAL vocabulary V. Every ln is
IEEE double in both engines; the per-class score is rounded to 4
decimals (the repo's float contract) BEFORE the argmax, and ties break
lang-ascending, so the predicted class is a deterministic function of
the quantized scores on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the portable tokenizer shared with sampling.unigram_logprob: identical
# semantics in Spark and DuckDB regex engines (no \b, no classes)
WORD_RE = r"[a-z0-9]+"


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, word) token stream — one row per occurrence."""
    return docs.select(
        "doc_id",
        "lang",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0)).alias("word"),
    )


def nb_class_stats(docs: DataFrame) -> DataFrame:
    """Training-side summary of the fitted model: per class (language
    label) the document count, token mass, and class vocabulary size.
    Pure integer aggregation — the cheapest possible cross-engine pin of
    the model-fitting pass (the full model table is asserted indirectly
    through every nb_classify score)."""
    return (
        _tokens(docs)
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_tokens"),
            F.countDistinct("word").alias("class_vocab"),
        )
    )


def nb_classify(docs: DataFrame) -> DataFrame:
    """Train on the corpus's own (text, lang) pairs and emit the argmax
    class per document: (doc_id, pred_lang, score).

    Self-labeling (train == score corpus) is the oracle-friendly setup;
    the planted pytest proves real separation on distinctive vocabularies
    (tests/test_classifier.py). In production the model table comes from
    a labeled slice and the scoring corpus is the other 10^12 docs — the
    plan is identical because the model side is broadcast either way."""
    toks = _tokens(docs)

    # per-doc features: distinct words with multiplicity (corpus-sized,
    # narrow) — the one exchange the text pays
    wc = toks.groupBy("doc_id", "word").agg(F.count("*").alias("k"))

    # the model: class-conditional counts + class totals (vocab-sized)
    cc = toks.groupBy("lang", "word").agg(F.count("*").alias("c"))
    ct = cc.groupBy("lang").agg(F.sum("c").alias("tot"))
    vocab = toks.agg(F.countDistinct("word").alias("vocab"))
    priors = docs.groupBy("lang").agg(F.count("*").alias("nd"))
    nd_tot = docs.agg(F.count("*").cast("double").alias("nd_tot"))

    # fan the word-count stream out over the |classes| rows and join the
    # broadcast model: term = k * ln(c+1), absent (word,class) -> c = 0
    per_class = (
        wc.crossJoin(F.broadcast(ct))
        .join(F.broadcast(cc), ["word", "lang"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("k") * F.log(F.coalesce(F.col("c"), F.lit(0)) + F.lit(1))).alias("s"),
            F.sum("k").alias("ntok"),
        )
    )

    scored = (
        per_class.join(F.broadcast(ct), "lang")
        .join(F.broadcast(priors), "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(nd_tot))
        .select(
            "doc_id",
            "lang",
            F.round(
                F.col("s")
                - F.col("ntok") * F.log(F.col("tot") + F.col("vocab"))
                + F.log(F.col("nd"))
                - F.log(F.col("nd_tot")),
                4,
            ).alias("score"),
        )
    )

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "score")
    )
