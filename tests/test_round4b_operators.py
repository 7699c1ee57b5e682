"""Planted-ground-truth checks for the round-4b additions (char entropy,
BM25 ranked retrieval, SemDeDup) — independent of the DuckDB oracles, so
a shared-wrong-logic tautology between the Spark and SQL forms cannot
hide: expectations here are hand-computed or derived with plain Python
math over tiny planted inputs."""

import math
from collections import Counter

from pyspark.sql import functions as F

from docling_nlp_api_spark.operators import dedup as D
from docling_nlp_api_spark.operators import nlp as N
from docling_nlp_api_spark.operators import textquality as Q


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"d{i:03d}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )


# --- char entropy -----------------------------------------------------------


def _expected_entropy(text):
    if not text:
        return None
    c = Counter(text)
    n = len(text)
    return round(math.log2(n) - sum(k * math.log2(k) for k in c.values()) / n, 4)


def test_char_entropy_planted(spark):
    texts = [
        "ab" * 32,        # 64 chars, 2 uniform symbols -> exactly 1.0, low
        "abcdefgh" * 8,   # 8 uniform symbols -> exactly 3.0, not low
        "a" * 40,         # one symbol -> 0.0, low
        "aaa",            # too short to gate
        "",               # degenerate: NULL entropy, never flagged
        "The quick brown fox jumps over the lazy dog!",  # prose > 2.5 bits
    ]
    rows = {r["doc_id"]: r for r in Q.char_entropy(_docs(spark, texts)).collect()}
    assert len(rows) == len(texts)
    for i, t in enumerate(texts):
        r = rows[f"d{i:03d}"]
        assert r["n_chars"] == len(t)
        assert r["n_distinct_chars"] == len(set(t))
        assert r["char_entropy"] == _expected_entropy(t)
        exp_flag = len(t) >= Q.ENTROPY_MIN_CHARS and _expected_entropy(t) < Q.ENTROPY_MIN_BITS
        assert r["low_entropy"] == exp_flag, (t[:20], r)
    assert rows["d000"]["char_entropy"] == 1.0 and rows["d000"]["low_entropy"]
    assert rows["d001"]["char_entropy"] == 3.0 and not rows["d001"]["low_entropy"]
    assert rows["d002"]["low_entropy"]
    assert rows["d004"]["char_entropy"] is None and not rows["d004"]["low_entropy"]


# --- BM25 -------------------------------------------------------------------


def test_bm25_planted(spark):
    corpus = {
        "d000": "table table table wood",
        "d001": "table hash",
        "d002": "wood stone brick",
        "d003": "hash hash hash hash hash",
        "d004": "no query words here",  # 'no' too short for TOKEN_RE; still no hit
    }
    out = N.bm25_topk(_docs(spark, list(corpus.values())), terms=("table", "hash"))
    rows = out.collect()
    got = {r["doc_id"]: r for r in rows}
    # only docs containing >= 1 query term rank
    assert set(got) == {"d000", "d001", "d003"}

    # mirror TOKEN_RE: lowercase alpha words of >= 3 letters
    toks = {
        k: [w for w in v.split() if len(w) >= 3 and w.isalpha()]
        for k, v in corpus.items()
    }
    dls = {k: len(v) for k, v in toks.items()}
    n, avgdl = len(corpus), sum(dls.values()) / len(corpus)

    def score(doc, term):
        tf = toks[doc].count(term)
        df = sum(1 for t in toks.values() if term in t)
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        return idf * tf / (tf + N.BM25_K1 * (1 - N.BM25_B + N.BM25_B * dls[doc] / avgdl))

    for doc, r in got.items():
        exp = round(score(doc, "table") + score(doc, "hash"), 4)
        assert r["bm25"] == exp, (doc, r["bm25"], exp)
        assert r["dl"] == dls[doc]
        assert r["tf_table"] == toks[doc].count("table")
        assert r["tf_hash"] == toks[doc].count("hash")
    # descending by score, doc_id tiebreak
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)


# --- SemDeDup ---------------------------------------------------------------


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_semdedup_planted(spark):
    # init = two smallest vec_ids -> v0 seeds cluster A (x-axis),
    # v1 seeds cluster B (y-axis); Lloyd keeps that split
    vecs = [
        [1.0, 0.0],     # 0: A
        [0.0, 1.0],     # 1: B
        [0.99, 0.01],   # 2: A, ~v0 -> dup_of 0
        [0.02, 0.98],   # 3: B, ~v1 -> dup_of 1
        [0.75, 0.66],   # 4: borderline but assigned somewhere; cos vs v0 = .75 < eps
        [0.98, 0.03],   # 5: A, ~v0 AND ~v2 -> dup_of must be the MIN partner (0)
    ]
    out = D.semdedup_df(_emb(spark, vecs), n_clusters=2, iters=2, eps=0.9)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 6
    assert rows[0]["cluster"] == rows[2]["cluster"] == rows[5]["cluster"]
    assert rows[1]["cluster"] == rows[3]["cluster"]
    assert rows[0]["cluster"] != rows[1]["cluster"]
    # keep-lowest-id rule: seeds survive, near-copies flagged
    assert not rows[0]["is_dup"] and rows[0]["dup_of"] is None
    assert not rows[1]["is_dup"] and rows[1]["dup_of"] is None
    assert rows[2]["is_dup"] and rows[2]["dup_of"] == 0
    assert rows[3]["is_dup"] and rows[3]["dup_of"] == 1
    assert rows[5]["is_dup"] and rows[5]["dup_of"] == 0  # MIN(0, 2), not 2
    assert not rows[4]["is_dup"]
    # verify the planted cosines justify the verdicts
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.hypot(*a) * math.hypot(*b))
    assert cos(vecs[0], vecs[2]) >= 0.9 and cos(vecs[0], vecs[5]) >= 0.9
    assert cos(vecs[0], vecs[4]) < 0.9 and cos(vecs[1], vecs[4]) < 0.9


# --- containment ------------------------------------------------------------


def test_containment_planted(spark):
    # a 12-word doc quoted verbatim inside a 120-word doc: Jaccard is
    # tiny (~|short|/|long|) but containment(short->long) == 1.0 — the
    # pair NO Jaccard/minhash threshold can isolate
    quote = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    # filler must be pure-alpha: TOKEN_RE (\b[a-zA-Z]{3,}\b) drops
    # digit-bearing words entirely
    filler = " ".join(
        f"filler{a}{b}" for a in "abcdefghij" for b in "abcdefghijkl"
    )
    corpus = [
        filler + " " + quote,     # d000: the long host
        quote,                    # d001: the contained extract
        "completely different tokens entirely " * 3,  # d002: unrelated
    ]
    out = D.containment_pairs(_docs(spark, corpus), threshold=0.8)
    rows = {(r["doc_a"], r["doc_b"]): r for r in out.collect()}
    assert set(rows) == {("d000", "d001")}
    r = rows[("d000", "d001")]
    # every shingle of the quote appears in the host
    assert r["containment_b"] == 1.0 and r["n_common"] == r["n_b"]
    assert r["jaccard"] < 0.2  # Jaccard would never flag this pair
    # the host side is NOT contained in the quote
    assert r["containment_a"] < 0.2


def test_containment_rarity_gate_bounds_candidates(spark):
    # every shingle of the repeated boilerplate string appears in all 8
    # docs (df = 8 > max_df = 5), so the gate yields ZERO candidates —
    # corpus-common text is segment_boilerplate's job, not dedup's
    boiler = "this exact boilerplate sentence repeats across every single document"
    out = D.containment_pairs(_docs(spark, [boiler] * 8), max_df=5)
    assert out.count() == 0
    # at a permissive gate the same corpus floods: 8*7/2 identical pairs
    out2 = D.containment_pairs(_docs(spark, [boiler] * 8), max_df=8)
    assert out2.count() == 28
    assert all(r["containment_a"] == 1.0 for r in out2.collect())


# --- corpus overlap ---------------------------------------------------------


def _shingle_set(texts):
    """Independent mirror of the shingle-hash pipeline via hashlib."""
    import hashlib
    import re

    out = set()
    for t in texts:
        toks = re.findall(r"\b[a-zA-Z]{3,}\b", t.lower())
        for i in range(len(toks) - 2):
            s = " ".join(toks[i : i + 3])
            out.add(int(hashlib.md5(s.encode()).hexdigest()[:8], 16))
    return out


def test_corpus_overlap_planted(spark):
    from docling_nlp_api_spark.operators import snapshots as SN

    a = "alpha bravo charlie delta echo foxtrot golf hotel india"
    b = "juliet kilo lima mike november oscar papa quebec romeo"
    c = "sierra tango uniform victor whiskey xray yankee zulu alphabet"
    old, new = _docs(spark, [a, b]), _docs(spark, [a, c])
    r = SN.corpus_overlap(old, new).collect()[0]
    sa, sb, sc = _shingle_set([a]), _shingle_set([b]), _shingle_set([c])
    o, n = sa | sb, sa | sc
    assert r["n_shingles_old"] == len(o) and r["n_shingles_new"] == len(n)
    assert r["n_common"] == len(o & n)
    assert r["jaccard_exact"] == round(len(o & n) / len(o | n), 4)
    # estimator bounds: agree / k, consistent with its own fields
    assert 0 <= r["n_agree"] <= r["k"] and r["jaccard_est"] == round(r["n_agree"] / r["k"], 4)

    # identical corpora: exact AND estimate are exactly 1.0
    r1 = SN.corpus_overlap(old, old).collect()[0]
    assert r1["jaccard_exact"] == 1.0 and r1["n_agree"] == r1["k"] and r1["jaccard_est"] == 1.0

    # disjoint corpora: exact 0; mins can only agree via a 2^-32 collision
    r0 = SN.corpus_overlap(_docs(spark, [b]), _docs(spark, [c])).collect()[0]
    assert r0["n_common"] == 0 and r0["jaccard_exact"] == 0.0 and r0["n_agree"] == 0


# --- token-budget selection -------------------------------------------------


def test_token_budget_select_planted(spark):
    """Mirror the maximal-prefix rule in plain Python (global sort by
    (quality DESC, md5 ASC), cumsum <= budget) and require the engine's
    bounded-histogram path to reproduce it EXACTLY — including inside
    the boundary quality bucket, where md5 order decides."""
    import hashlib

    from docling_nlp_api_spark.operators import sampling as SP
    from docling_nlp_api_spark.operators import textquality as Q

    # many docs sharing quality buckets: identical texts => identical
    # round-4 quality, so the boundary bucket holds several docs
    texts = (
        ["high quality words " * 30] * 4      # long-ish, same bucket
        + ["medium text here " * 10] * 6      # the likely boundary bucket
        + ["tiny"] * 5                        # low quality
    )
    df = _docs(spark, texts)
    scored = {
        r["doc_id"]: (r["quality"], r["words"])
        for r in Q.quality_score(df).collect()
    }
    # high bucket totals 4*90=360 words, medium docs are 30 words each:
    # 460 keeps all high + exactly 3 medium docs (md5 order picks WHICH 3)
    budget = 460
    order = sorted(
        scored,
        key=lambda d: (-scored[d][0], hashlib.md5(d.encode()).hexdigest()),
    )
    kept_exp, cum = set(), 0
    for d in order:
        if cum + scored[d][1] <= budget:
            cum += scored[d][1]
            kept_exp.add(d)
        else:
            break  # maximal prefix: first overflow ends the selection
    out = SP.token_budget_select(df, budget=budget)
    kept_got = {r["doc_id"] for r in out.collect()}
    assert kept_got == kept_exp
    # the cut is strictly inside the corpus and respects the budget
    assert 0 < len(kept_got) < len(texts)
    got_tokens = sum(scored[d][1] for d in kept_got)
    assert got_tokens <= budget


def test_token_budget_whole_corpus_fits(spark):
    from docling_nlp_api_spark.operators import sampling as SP

    df = _docs(spark, ["some short document here"] * 3)
    out = SP.token_budget_select(df, budget=10_000)
    assert out.count() == 3


# --- text normalization -----------------------------------------------------


def test_normalize_text_planted(spark):
    messy = "“Hello’s — world…”\x07  and more – end―here‚„‘ok’"
    clean = "plain ascii stays untouched"
    spaced = "collapse   these\t\twhitespace\n\nruns"
    rows = {
        r["doc_id"]: r
        for r in Q.normalize_text(_docs(spark, [messy, clean, spaced])).collect()
    }
    # exact expectation built from the published maps, not hand-typed
    exp = messy
    exp = exp.translate(str.maketrans(Q.NORM_SRC, Q.NORM_DST))
    exp = exp.replace(Q.NORM_ELLIPSIS, "...")
    import re as _re
    exp = _re.sub(Q.CTRL_RE, "", exp)
    exp = _re.sub(r"\s+", " ", exp).strip()
    assert rows["d000"]["text_norm"] == exp
    assert rows["d000"]["changed"] and rows["d000"]["n_chars_norm"] == len(exp)
    assert "‘" not in exp and " " not in exp and "\x07" not in exp
    assert rows["d001"]["text_norm"] == clean and not rows["d001"]["changed"]
    assert rows["d002"]["text_norm"] == "collapse these whitespace runs"
    assert rows["d002"]["changed"]


# --- language mixing --------------------------------------------------------


def test_lang_mix_planted(spark):
    texts = [
        # 1 en + 1 de sentence: mixed, dominant tie (1,1) -> 'de'
        # (lexicographic tiebreak, the lang_id rule)
        "the cat and the dog. der und das ist die",
        # 2 en sentences: monolingual
        "the cat and the dog. the end of all things",
        # marker-free: all sentences unknown -> n_langs 0, never mixed
        "xyz qqq. zzz www",
        # 2 en + 1 fr: mixed with an en majority
        "the cat and the dog. the end of all things. le et la les est",
    ]
    rows = {r["doc_id"]: r for r in Q.lang_mix(_docs(spark, texts)).collect()}
    r0 = rows["d000"]
    assert r0["n_sents"] == 2 and r0["n_langs"] == 2 and r0["is_mixed"]
    assert r0["dominant_lang"] == "de" and r0["dominant_share"] == 0.5
    r1 = rows["d001"]
    assert not r1["is_mixed"] and r1["dominant_lang"] == "en"
    assert r1["dominant_share"] == 1.0 and r1["n_langs"] == 1
    r2 = rows["d002"]
    assert r2["n_langs"] == 0 and not r2["is_mixed"]
    assert r2["dominant_lang"] == "unknown"
    r3 = rows["d003"]
    assert r3["is_mixed"] and r3["dominant_lang"] == "en"
    assert r3["dominant_share"] == 0.6667 and r3["n_sents"] == 3


# --- badwords gate -----------------------------------------------------------


def test_badwords_gate_planted(spark):
    texts = [
        "clean table scan with join and filter",          # kept
        "this dup row is a dup of another dup",           # 3 hits, 1 distinct
        "forbidden merge then a dup appears",             # 2 distinct words
        "Dup at sentence start",                          # lowercased tokenizer
        "duplicate is a DIFFERENT token than dup-stem",   # 'duplicate' != 'dup';
                                                          # 'dup' from 'dup-stem'
        "",                                               # empty text kept
    ]
    rows = {
        r["doc_id"]: r
        for r in Q.badwords_gate(_docs(spark, texts)).collect()
    }
    assert rows["d000"]["kept"] and rows["d000"]["n_hits"] == 0
    assert rows["d000"]["first_hit"] is None
    assert rows["d001"].asDict() == {"doc_id": "d001", "n_hits": 3,
                                     "n_distinct_hits": 1, "first_hit": "dup",
                                     "kept": False}
    assert rows["d002"]["n_hits"] == 2 and rows["d002"]["n_distinct_hits"] == 2
    assert rows["d002"]["first_hit"] == "forbidden"
    assert not rows["d003"]["kept"] and rows["d003"]["first_hit"] == "dup"
    # 'duplicate' must NOT match 'dup' (whole-token, not substring), but the
    # \b tokenizer splits 'dup-stem' into 'dup' + 'stem' -> one hit
    assert rows["d004"]["n_hits"] == 1 and rows["d004"]["n_distinct_hits"] == 1
    assert rows["d005"]["kept"] and rows["d005"]["n_hits"] == 0


def test_badwords_gate_custom_list(spark):
    out = Q.badwords_gate(
        _docs(spark, ["alpha beta gamma", "beta beta"]), words=("beta",)
    ).collect()
    got = {r["doc_id"]: (r["n_hits"], r["kept"]) for r in out}
    assert got == {"d000": (1, False), "d001": (2, False)}


# --- caption pair mining ------------------------------------------------------


def _spans_table(spark, rows):
    """rows: list of (doc_id, [(kind, text, media_ref, offset), ...]) with
    the ARRAY deliberately out of reading order where the case needs it."""
    data = [
        (did, [{"kind": k, "text": t, "media_ref": m, "offset": o}
               for (k, t, m, o) in spans])
        for did, spans in rows
    ]
    schema = ("doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    return spark.createDataFrame(data, schema)


def test_caption_pairs_planted(spark):
    from docling_nlp_api_spark.operators import multimodal as M

    tbl = _spans_table(spark, [
        # own caption AFTER at dist 1 (html figure convention)
        ("after1", [("image", "", "m://a/0", 0), ("caption", "capA", "", 1)]),
        # own caption BEFORE at dist 1
        ("before1", [("caption", "capB", "", 0), ("image", "", "m://b/0", 1)]),
        # tie at dist 1 both sides -> following wins
        ("tie", [("caption", "lose", "", 0), ("image", "", "m://t/0", 1),
                 ("caption", "win", "", 2)]),
        # nearest caption at dist 3 > max_dist -> unpaired
        ("far", [("image", "", "m://f/0", 0), ("p", "x", "", 1),
                 ("p", "y", "", 2), ("caption", "late", "", 3)]),
        # no caption at all -> unpaired
        ("none", [("p", "x", "", 0), ("image", "", "m://n/0", 1)]),
        # ARRAY ORDER SHUFFLED: offsets say caption(2) follows image(1);
        # a position-order implementation would pair with 'wrongcap'
        ("shuf", [("caption", "rightcap", "", 2), ("image", "", "m://s/0", 1),
                  ("caption", "wrongcap", "", 5), ("p", "x", "", 0),
                  ("p", "y", "", 3), ("p", "z", "", 4)]),
    ])
    got = {r["doc_id"]: r for r in M.caption_pairs(tbl).collect()}
    assert got["after1"]["caption_text"] == "capA"
    assert got["after1"]["rel"] == "after" and got["after1"]["dist"] == 1
    assert got["before1"]["caption_text"] == "capB"
    assert got["before1"]["rel"] == "before" and got["before1"]["dist"] == 1
    assert got["tie"]["caption_text"] == "win" and got["tie"]["rel"] == "after"
    assert got["far"]["caption_text"] is None and got["far"]["rel"] is None
    assert got["none"]["caption_text"] is None and got["none"]["dist"] is None
    assert got["shuf"]["caption_text"] == "rightcap"
    assert got["shuf"]["rel"] == "after" and got["shuf"]["dist"] == 1


def test_caption_pairs_matches_python_reference_on_datagen(spark):
    """Third-form check over the REAL fixture generator (random media
    placement, 20% shuffled storage): a test-local pure-Python pairing
    vs the Spark windows, 200 docs."""
    from docling_nlp_api_spark.datagen import spans_df
    from docling_nlp_api_spark.operators import multimodal as M

    tbl = spans_df(spark, 200)
    got = {
        (r["doc_id"], r["media_pos"]): (
            r["caption_text"], r["caption_pos"], r["rel"], r["dist"])
        for r in M.caption_pairs(tbl).collect()
    }
    expected = {}
    for row in tbl.select("doc_id", "spans").collect():
        spans = sorted(
            [(s["offset"], s["kind"], s["text"], s["media_ref"]) for s in row["spans"]]
        )
        caps = [(o, t) for (o, k, t, _m) in spans if k == "caption"]
        for o, _k, _t, m in spans:
            if not m:
                continue
            prev = max(((co, ct) for co, ct in caps if co < o), default=None)
            nxt = min(((co, ct) for co, ct in caps if co > o), default=None)
            pick, rel = None, None
            if nxt and (not prev or nxt[0] - o <= o - prev[0]):
                pick, rel = nxt, "after"
            elif prev:
                pick, rel = prev, "before"
            if pick and abs(pick[0] - o) <= M.CAPTION_MAX_DIST:
                expected[(row["doc_id"], o)] = (
                    pick[1], pick[0], rel, abs(pick[0] - o))
            else:
                expected[(row["doc_id"], o)] = (None, None, None, None)
    assert got == expected
    assert any(v[0] is not None for v in got.values())   # some pairs found
    assert any(v[0] is None for v in got.values())       # some unpaired media


# --- cross-split leakage audit ------------------------------------------------


def test_split_leakage_planted(spark):
    """Doc ids chosen by recomputing the md5 split buckets in plain
    Python (train: 0-5, val: 69/87/107, test: 20/23/30). Plants:
      - val 69  = EXACT copy of train 0            -> exact + cand leak
      - val 87  = NORMALIZATION variant of train 1 -> exact leak (the
                  normalized hash folds case/punct) + cand leak
      - test 20 = train 2 minus its last word      -> near-dup candidate
                  but NOT an exact leak
      - val 107, test 23/30 unique                 -> clean
    """
    from docling_nlp_api_spark.operators import sampling as SP

    base = ("spark filter join hash batch scan merge column window "
            "vector stream table order group value line row data query")
    rows = [
        (0, base + " zero"),
        (1, base + " one two three"),
        (2, base + " two alpha beta"),
        (3, base + " three"),
        (69, base + " zero"),                        # exact copy of 0
        (87, "  " + (base + " one two three").upper() + " !!"),  # norm variant of 1
        (20, base + " two alpha"),                   # 2 minus last word
        (107, "totally different content about nothing shared at all "
              "unique val words here padding padding padding"),
        (23, "another unique test doc with its own vocabulary and no "
             "overlap whatsoever more filler filler filler"),
        (30, "third unique probe document unrelated content entirely "
             "separate tokens filler filler filler filler"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["split"]: r for r in SP.split_leakage(docs).collect()}
    assert got["val"]["n_docs"] == 3 and got["test"]["n_docs"] == 3
    assert got["val"]["n_exact_leaks"] == 2        # 69 exact, 87 normalized
    assert got["test"]["n_exact_leaks"] == 0       # truncation != exact
    assert got["val"]["n_neardup_cands"] == 2      # identical sigs collide
    assert got["test"]["n_neardup_cands"] == 1     # 20 shares 2's buckets
    assert got["val"]["exact_rate"] == round(2 / 3, 4)
    assert got["test"]["cand_rate"] == round(1 / 3, 4)


# --- tokenizer fertility --------------------------------------------------


def test_token_fertility_planted(spark):
    import re

    rows = [
        ("en", "hello world"),                    # 2 words
        ("en", "don't stop-me now!!"),            # punctuation splits BPE tokens
        ("de", "Donaudampfschifffahrt kurz"),     # long compound: fertility 1
        ("zz", ""),                               # empty: NULL ratios
    ]
    docs = spark.createDataFrame(rows, "lang string, text string")
    got = {r["lang"]: r for r in Q.token_fertility(docs).collect()}

    bpe = re.compile(Q.BPE_RE)
    by_lang = {}
    for lang, t in rows:
        w, tk, c = len(t.split()), len(bpe.findall(t)), len(t)
        d = by_lang.setdefault(lang, [0, 0, 0, 0])
        d[0] += 1; d[1] += w; d[2] += tk; d[3] += c
    for lang, (nd, w, tk, c) in by_lang.items():
        r = got[lang]
        assert (r["n_docs"], r["n_words"], r["n_tokens"], r["n_chars"]) == (nd, w, tk, c)
        assert r["fertility"] == (round(tk / w, 4) if w else None)
        assert r["chars_per_token"] == (round(c / tk, 4) if tk else None)
    # the punctuated doc must push en fertility above 1 token/word
    assert got["en"]["fertility"] > 1.0
    assert got["zz"]["fertility"] is None and got["zz"]["chars_per_token"] is None


# --- as-of join / range join ------------------------------------------------


def _events(spark, rows):
    """rows: (event_id, us_offset, user_id, event_type, value); timestamps
    are built at exact microsecond offsets from a fixed anchor."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 3, 1)
    return spark.createDataFrame(
        [
            (eid, t0 + timedelta(microseconds=us), uid, et, val)
            for eid, us, uid, et, val in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_asof_join_planted(spark):
    from docling_nlp_api_spark.operators import relational as R

    M = 1_000_000
    ev = _events(spark, [
        # user 1: two earlier views + two views tied AT the purchase ts
        (10, 1 * M, 1, "view", 1.0),
        (11, 5 * M, 1, "view", 2.0),
        (13, 9 * M, 1, "view", 3.0),
        (14, 9 * M, 1, "view", 4.0),      # same ts as purchase, higher id wins
        (12, 9 * M, 1, "purchase", 50.0),
        # user 2: purchase with NO prior view (view comes after)
        (20, 3 * M, 2, "purchase", 60.0),
        (21, 4 * M, 2, "view", 5.0),
        # user 3: only another user's view exists before -> still NULL
        (30, 8 * M, 3, "purchase", 70.0),
        # user 2 again: second purchase AFTER its view
        (22, 7 * M, 2, "purchase", 80.0),
    ])
    got = {r["event_id"]: r for r in R.asof_view_before_purchase(ev).collect()}
    assert set(got) == {12, 20, 30, 22}
    # equal-ts tie: view 14 (max event_id at ts 9s) matches, lag exactly 0
    assert got[12]["view_event_id"] == 14
    assert got[12]["view_value"] == 4.0
    assert got[12]["lag_us"] == 0
    # no prior view -> NULL columns (left semantics)
    assert got[20]["view_event_id"] is None and got[20]["lag_us"] is None
    assert got[30]["view_event_id"] is None
    # later purchase of user 2 picks the view between its purchases
    assert got[22]["view_event_id"] == 21
    assert got[22]["lag_us"] == 3 * M


def test_asof_join_null_key_and_ts_follow_sql_semantics(spark):
    """SQL equi-predicates never match NULLs, but a window PARTITIONS
    NULL keys together and sorts NULL ts first — the exact divergence
    the right-side NULL drop in asof_join guards against. Plants: a
    NULL-user view and a NULL-ts view (both must never be a match), a
    NULL-user purchase and a NULL-ts purchase (both must survive with
    NULL match columns, left semantics)."""
    from datetime import datetime, timedelta

    from docling_nlp_api_spark.operators import relational as R

    M = 1_000_000
    t0 = datetime(2024, 3, 1)
    ts = lambda us: t0 + timedelta(microseconds=us)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (40, ts(1 * M), None, "view", 1.0),    # NULL user: unmatchable
            (41, None, 5, "view", 2.0),            # NULL ts: unmatchable
            (42, ts(9 * M), None, "purchase", 50.0),   # NULL-user probe
            (43, None, 5, "purchase", 60.0),           # NULL-ts probe
            (44, ts(8 * M), 5, "purchase", 70.0),  # real user-5 purchase
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {r["event_id"]: r for r in R.asof_view_before_purchase(ev).collect()}
    assert set(got) == {42, 43, 44}
    # without the guard, view 40 would ride the NULL-key partition into
    # purchase 42, and view 41 (NULL ts sorts FIRST) into 43 and 44
    assert got[42]["view_event_id"] is None
    assert got[43]["view_event_id"] is None
    assert got[44]["view_event_id"] is None


def test_asof_join_generic_payload_and_keys(spark):
    from docling_nlp_api_spark.operators import relational as R

    M = 1_000_000
    left = _events(spark, [(1, 10 * M, 7, "purchase", 0.0)])
    right = _events(spark, [
        (2, 10 * M, 7, "view", 1.5),     # equal ts: matches (<= contract)
        (3, 11 * M, 7, "view", 9.9),     # after: never matches
    ])
    out = R.asof_join(left, right, payload=("event_id", "value")).collect()
    assert len(out) == 1
    assert out[0]["matched_event_id"] == 2
    assert out[0]["matched_value"] == 1.5
    # all left columns survive untouched
    assert out[0]["event_id"] == 1 and out[0]["event_type"] == "purchase"


def test_range_join_planted(spark):
    from docling_nlp_api_spark.operators import relational as R

    M = 1_000_000
    W = R.RANGE_WINDOW_US  # 60 s
    ev = _events(spark, [
        # error at 100 s; neighbors planted around the +/- 60 s boundary
        (1, 100 * M, 1, "error", 0.0),
        (2, 40 * M, 2, "view", 1.25),          # exactly -60 s: included (<=)
        (3, 160 * M, 3, "click", 2.5),         # exactly +60 s: included
        (4, 160 * M + 1, 4, "view", 4.0),      # 60 s + 1 us: excluded
        (5, 39 * M, 5, "view", 8.0),           # -61 s: excluded
        # a second error inside the first's window: errors are events too
        (6, 130 * M, 6, "error", 16.0),
        # isolated error, no neighbor within 60 s
        (7, 1000 * M, 7, "error", 32.0),
    ])
    got = {r["event_id"]: r for r in R.range_join_nearby(ev).collect()}
    assert set(got) == {1, 6, 7}
    # error 1 sees 2, 3 and error 6 (self excluded by event_id)
    assert got[1]["n_nearby"] == 3
    assert got[1]["nearby_value"] == round(1.25 + 2.5 + 16.0, 2)
    # error 6 sees error 1 and event 3 (at 160 s, 30 s away) and 4
    assert got[6]["n_nearby"] == 3
    assert got[6]["nearby_value"] == round(0.0 + 2.5 + 4.0, 2)
    # isolated error survives with zero neighbors, NULL sum
    assert got[7]["n_nearby"] == 0 and got[7]["nearby_value"] is None


def test_range_join_bucket_boundary(spark):
    """A pair whose members sit in ADJACENT buckets but within the window
    must be found exactly once (the 3-bucket fan-out covers it, and the
    build row's single bucket prevents double counting)."""
    from docling_nlp_api_spark.operators import relational as R

    M = 1_000_000
    # bucket width = 60 s: 59.5 s is bucket 0, 60.5 s is bucket 1; 1 s apart
    ev = _events(spark, [
        (1, 59_500_000, 1, "error", 0.0),
        (2, 60_500_000, 2, "view", 7.0),
    ])
    got = R.range_join_nearby(ev).collect()
    assert len(got) == 1
    assert got[0]["n_nearby"] == 1 and got[0]["nearby_value"] == 7.0


# --- randomized equivalence vs independent brute-force oracles --------------
# The planted tests above pin the tricky cases by hand; these fuzz the SAME
# operators against O(n^2)/per-row pure-Python oracles over seeded random
# data dense in ties (tiny user set, coarse timestamp grid, duplicate ts)
# and NULLs — the regimes where a window-based rewrite of a join is most
# likely to diverge from the join semantics it claims to replay.


def _random_events(seed, n=250, with_nulls=True):
    import random

    rng = random.Random(seed)
    rows = []
    for eid in range(n):
        uid = rng.choice([1, 2, 3, None] if with_nulls else [1, 2, 3])
        # coarse 10 s grid over ~5 min -> many exact ts collisions
        us = rng.randrange(0, 30) * 10_000_000
        if with_nulls and rng.random() < 0.05:
            us = None
        et = rng.choice(["view", "purchase", "error", "click"])
        rows.append((eid, us, uid, et, round(rng.uniform(0, 10), 2)))
    return rows


def _events_nullable(spark, rows):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 3, 1)
    return spark.createDataFrame(
        [
            (eid, None if us is None else t0 + timedelta(microseconds=us), uid, et, val)
            for eid, us, uid, et, val in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_asof_join_random_vs_bruteforce(spark):
    """asof_view_before_purchase == per-purchase brute-force max-by-(ts,id)
    scan over the same rows, on 3 seeds x 250 events with NULL users/ts
    and heavy ts ties. SQL NULL contract: a NULL never matches; a
    purchase with NULL ts has no prior view by definition."""
    from docling_nlp_api_spark.operators import relational as R

    for seed in (11, 12, 13):
        rows = _random_events(seed)
        got = {
            r["event_id"]: (r["view_event_id"], r["lag_us"])
            for r in R.asof_view_before_purchase(
                _events_nullable(spark, rows)
            ).collect()
        }
        purchases = [r for r in rows if r[3] == "purchase"]
        assert set(got) == {p[0] for p in purchases}
        for eid, us, uid, _, _ in purchases:
            if uid is None or us is None:
                best = None
            else:
                cands = [
                    (v_us, v_eid)
                    for v_eid, v_us, v_uid, v_et, _ in rows
                    if v_et == "view" and v_uid == uid
                    and v_us is not None and v_us <= us
                ]
                best = max(cands) if cands else None  # max by (ts, event_id)
            if best is None:
                assert got[eid] == (None, None), (seed, eid)
            else:
                assert got[eid] == (best[1], us - best[0]), (seed, eid)


def test_range_join_random_vs_bruteforce(spark):
    """range_join_nearby == O(n^2) scan, 3 seeds x 250 events on a grid
    chosen so neighbors land in same AND adjacent buckets and exactly AT
    the +/- 60 s boundary (<= contract). No NULLs: ts is the probe key.
    Sum comparison uses round-2 on both sides (values are round-2 so the
    sum is exact in binary at this magnitude)."""
    from docling_nlp_api_spark.operators import relational as R

    for seed in (21, 22, 23):
        rows = _random_events(seed, with_nulls=False)
        got = {
            r["event_id"]: (r["n_nearby"], r["nearby_value"])
            for r in R.range_join_nearby(_events_nullable(spark, rows)).collect()
        }
        errors = [r for r in rows if r[3] == "error"]
        assert set(got) == {e[0] for e in errors}
        for eid, us, _, _, _ in errors:
            near = [
                v for v_eid, v_us, _, _, v in rows
                if v_eid != eid and abs(v_us - us) <= R.RANGE_WINDOW_US
            ]
            want = (len(near), round(sum(near), 2) if near else None)
            have = (got[eid][0],
                    None if got[eid][1] is None else round(got[eid][1], 2))
            assert have == want, (seed, eid, have, want)


def test_winnowing_shared_extract_guarantee(spark):
    """Schleimer et al. 2003's matching guarantee, on planted ground
    truth: two docs sharing a normalized substring of length
    >= W + K - 1 must share at least one selected fingerprint HASH,
    while hash-disjoint docs (no common 8-gram) share none. Checked via
    the digest inputs: recompute fingerprints with a tiny reference
    implementation and compare sets — this guards the engine against
    shared-wrong-logic with its DuckDB mirror."""
    import hashlib

    from docling_nlp_api_spark.operators.textquality import (
        WINNOW_K,
        WINNOW_W,
        winnowing_fingerprints,
    )

    shared = "the common stolen paragraph lives here unchanged"
    docs = [
        (1, f"intro words first. {shared} trailing remark one"),
        (2, f"a wholly different opening, {shared} and another end"),
        (3, "zzz qqq completely disjoint content xxyyzz"),
    ]

    def ref_fps(text: str) -> set[str]:
        import re
        nt = re.sub(r"\s+", " ", text.lower()).strip()
        grams = [hashlib.md5(nt[i:i + WINNOW_K].encode()).hexdigest()
                 for i in range(len(nt) - WINNOW_K + 1)]
        if not grams:
            return set()
        out = set()
        for j in range(max(len(grams) - WINNOW_W + 1, 1)):
            winw = grams[j:j + WINNOW_W]
            m = min(winw)
            out.add(f"{j + winw.index(m)}:{m}")
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in winnowing_fingerprints(df).collect()}
    for did, text in docs:
        fps = ref_fps(text)
        assert got[did]["n_fingerprints"] == len(fps), did
        digest = hashlib.md5("|".join(sorted(fps)).encode()).hexdigest()
        assert got[did]["fp_digest"] == digest, did
    h = lambda t: {fp.split(":", 1)[1] for fp in ref_fps(t)}  # noqa: E731
    assert h(docs[0][1]) & h(docs[1][1]), "shared extract must share a hash"
    assert not (h(docs[0][1]) & h(docs[2][1])), "disjoint docs must not"


def test_zipf_fit_recovers_planted_power_law(spark):
    """A corpus built with EXACT Zipf frequencies (word r appears
    round(C/r) times) must fit slope ~= -1 with near-perfect
    correlation; a uniform corpus (all words equal count) must fit
    slope = 0. Guards the regression algebra end-to-end."""
    from docling_nlp_api_spark.operators.textquality import zipf_fit

    words = [f"word{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(40)]
    zipf_text, uni_text = [], []
    for r, w in enumerate(words, start=1):
        zipf_text += [w] * max(round(1200 / r), 1)
        uni_text += [w] * 30
    z = spark.createDataFrame([(1, " ".join(zipf_text))], "doc_id long, text string")
    u = spark.createDataFrame([(1, " ".join(uni_text))], "doc_id long, text string")
    rz = zipf_fit(z).first()
    ru = zipf_fit(u).first()
    assert rz["n_ranked"] == 40 and ru["n_ranked"] == 40
    assert -1.1 < rz["slope"] < -0.9, rz
    assert rz["pearson_r"] < -0.99, rz
    assert abs(ru["slope"]) < 1e-9, ru
