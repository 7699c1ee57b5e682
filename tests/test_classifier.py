"""Planted-corpus tests for the Naive Bayes classifier plane
(operators/classifier.py): the exact cross-engine numerics are pinned by
the clf_nb_* oracles in test_catalog_oracle_tail.py; these tests prove
the model actually CLASSIFIES — separable vocabularies are recovered,
smoothing handles unseen words, and the quantized-argmax tiebreak is
deterministic."""

from __future__ import annotations

import math

from docling_nlp_api_spark.operators import classifier as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_separable_vocabularies_recovered(spark):
    """Distinct per-class vocabularies -> every doc classified to its own
    class, including docs that share a few common words."""
    rows = []
    for i in range(8):
        rows.append((i, "alpha beta gamma the and alpha beta", "aa"))
        rows.append((100 + i, "delta epsilon zeta the and delta", "bb"))
        rows.append((200 + i, "eta theta iota the and theta iota", "cc"))
    pred = {r.doc_id: r.pred_lang for r in C.nb_classify(_docs(spark, rows)).collect()}
    assert len(pred) == 24
    for i in range(8):
        assert pred[i] == "aa"
        assert pred[100 + i] == "bb"
        assert pred[200 + i] == "cc"


def test_prior_dominates_for_uninformative_text(spark):
    """A doc of only class-neutral words scores by class mass + prior:
    the majority class wins when likelihoods are symmetric."""
    rows = [(i, "common words here", "big") for i in range(9)]
    rows.append((100, "common words here", "sml"))
    pred = {r.doc_id: r.pred_lang for r in C.nb_classify(_docs(spark, rows)).collect()}
    # every doc's text is identical -> all predictions equal; the majority
    # class has both the higher prior and the higher smoothed likelihoods
    assert set(pred.values()) == {"big"}


def test_scores_match_hand_computed_nb(spark):
    """One tiny corpus, score recomputed by hand with the exact contract:
    sum k*ln(c+1) - n*ln(tot+V) + ln(nd_c) - ln(nd_tot), rounded to 4."""
    rows = [
        (1, "cat cat dog", "x"),
        (2, "fish fish fish", "y"),
    ]
    got = {r.doc_id: (r.pred_lang, r.score) for r in C.nb_classify(_docs(spark, rows)).collect()}

    # vocabulary V = {cat, dog, fish} = 3; class x: tot=3 (cat:2, dog:1);
    # class y: tot=3 (fish:3); priors 1/2 each
    def score(kc: dict, cc: dict, tot: int) -> float:
        s = sum(k * math.log(cc.get(w, 0) + 1) for w, k in kc.items())
        n = sum(kc.values())
        return round(s - n * math.log(tot + 3) + math.log(1) - math.log(2.0), 4)

    d1 = {"cat": 2, "dog": 1}
    x1 = score(d1, {"cat": 2, "dog": 1}, 3)
    y1 = score(d1, {"fish": 3}, 3)
    assert x1 > y1
    assert got[1] == ("x", x1)

    d2 = {"fish": 3}
    y2 = score(d2, {"fish": 3}, 3)
    assert got[2] == ("y", y2)


def test_quantized_tie_breaks_lang_ascending(spark):
    """Perfectly symmetric classes -> identical quantized scores; the
    argmax must break the tie to the lexicographically first class on
    both engines (the cross-engine determinism contract)."""
    rows = [
        (1, "foo foo", "mm"),
        (2, "bar bar", "zz"),
        (3, "foo bar", "mm"),
        (4, "foo bar", "zz"),
    ]
    got = {r.doc_id: r.pred_lang for r in C.nb_classify(_docs(spark, rows)).collect()}
    # docs 3/4 are symmetric between mm and zz (same counts, same priors,
    # same totals) -> tie -> 'mm' (asc) for both
    assert got[3] == "mm"
    assert got[4] == "mm"


def test_class_stats_shapes(spark):
    rows = [
        (1, "a1 b2 c3", "aa"),
        (2, "a1 a1", "aa"),
        (3, "zz", "bb"),
    ]
    stats = {r.lang: (r.n_docs, r.n_tokens, r.class_vocab)
             for r in C.nb_class_stats(_docs(spark, rows)).collect()}
    assert stats == {"aa": (2, 5, 3), "bb": (1, 1, 1)}


def test_lr_learns_separable_vocab(spark):
    """GD on a linearly separable planted corpus: 'en' docs carry marker
    tokens disjoint from the rest; after 3 full-batch iterations the
    model must classify every doc correctly and push the marker buckets'
    weights positive."""
    rows = []
    for i in range(12):
        rows.append((i, "alpha beta alpha beta gamma", "en"))
        rows.append((100 + i, "delta epsilon zeta epsilon", "fr"))
    docs = _docs(spark, [(d, t, g) for d, t, g in rows])
    scored = {r.doc_id: (r.y, r.pred, r.score) for r in C.lr_scores(docs).collect()}
    assert len(scored) == 24
    for did, (y, pred, _s) in scored.items():
        assert pred == y, (did, scored[did])
    # en scores strictly above fr scores (margin exists, not a 0.5 tie)
    en_min = min(s for _, (y, _p, s) in scored.items() if y == 1)
    fr_max = max(s for _, (y, _p, s) in scored.items() if y == 0)
    assert en_min > 0.5 > fr_max


def test_lr_weights_match_hand_rolled_gd(spark):
    """One tiny corpus, the full 3-iteration GD replayed in Python with
    the exact rounding contract — pins the driver-loop arithmetic
    (feature hashing included) independent of the DuckDB oracle."""
    import hashlib

    rows = [(1, "cat cat dog", "en"), (2, "fish fish", "fr")]
    docs = _docs(spark, rows)
    got = {r.bucket: r.weight for r in C.lr_weights_df(spark, docs).collect()}

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % C.LR_DIM

    feats = {1: {}, 2: {}}
    for did, text, _ in rows:
        for w in text.split():
            feats[did][bucket(w)] = feats[did].get(bucket(w), 0) + 1
    y = {1: 1, 2: 0}
    n = 2.0
    wts = [0.0] * C.LR_DIM
    for _ in range(C.LR_ITERS):
        grad = [0.0] * C.LR_DIM
        for did, fv in feats.items():
            z = round(sum(c * wts[b] for b, c in fv.items()), 6)
            p = round(1.0 / (1.0 + math.exp(-z)), 6)
            for b, c in fv.items():
                grad[b] += c * (p - y[did])
        wts = [round(wts[j] - C.LR_RATE * grad[j] / n, 6) for j in range(C.LR_DIM)]
    assert got == {j: wts[j] for j in range(C.LR_DIM)}
