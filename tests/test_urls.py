"""Planted-URL tests for the provenance plane (operators/urls.py): the
cross-engine numerics run in test_catalog_oracle_tail.py (url_* entries);
these pin the raw normalization/parse/blocklist semantics on hand-built
URLs covering every rule, including cases the augmentation can't emit
(http:80, bare-host URL, unknown-suffix domains)."""

from __future__ import annotations

from docling_nlp_api_spark.operators import urls as U

ROWS = [
    # (doc_id, url, expected url_norm, host, domain)
    (1, "HTTPS://WWW.Example.COM:443/a/index.html#frag",
        "https://www.example.com/a/", "www.example.com", "example.com"),
    (2, "http://news.bbc.co.uk:80/world?utm_source=x&id=7",
        "http://news.bbc.co.uk/world?id=7", "news.bbc.co.uk", "bbc.co.uk"),
    (3, "https://cdn.site.io/p?utm_campaign=a&utm_medium=b",
        "https://cdn.site.io/p", "cdn.site.io", "site.io"),
    (4, "https://a.b.example.com.au/x?ref=tw#s",
        "https://a.b.example.com.au/x", "a.b.example.com.au", "example.com.au"),
    (5, "https://plain.net/index.html",
        "https://plain.net/", "plain.net", "plain.net"),
    (6, "http://host.org:8080/keep:port?fbclid=abc",
        "http://host.org:8080/keep:port", "host.org", "host.org"),
    # path-less URL with a case-sensitive query value: the authority
    # case-fold must stop at '?' (round-3 advice — [^/?#] not [^/] in
    # SCHEME_HOST_RE), so Token=AbC keeps its case
    (7, "http://Host.com?Token=AbC",
        "http://host.com?Token=AbC", "host.com", "host.com"),
    # path-less URL with only a fragment: fold stops at '#', frag drops
    (8, "https://X.org#Frag",
        "https://x.org", "x.org", "x.org"),
]


def _parsed(spark):
    df = spark.createDataFrame(
        [(i, u, "en", 10) for i, u, *_ in ROWS],
        "doc_id long, url string, lang string, n_chars long",
    )
    return U.parse_normalize(df)


def test_normalize_and_parse_rules(spark):
    got = {r.doc_id: (r.url_norm, r.host, r.domain) for r in _parsed(spark).collect()}
    for doc_id, _url, norm, host, domain in ROWS:
        assert got[doc_id] == (norm, host, domain), (doc_id, got[doc_id])


def test_blocklist_filter_matches_summary(spark):
    df = spark.createDataFrame(
        [(i, u, "en", 10) for i, u, *_ in ROWS],
        "doc_id long, url string, lang string, n_chars long",
    )
    parsed = U.parse(U.normalize(df))
    blocked = ("site.io", "bbc.co.uk")
    kept = U.blocklist_filter(parsed, blocked)
    assert {r.doc_id for r in kept.collect()} == {1, 4, 5, 6, 7, 8}
    s = U.blocklist_summary(parsed, blocked).collect()[0]
    assert (s.n_kept, s.n_blocked, s.n_domains_blocked) == (6, 2, 2)


def test_blocklist_is_broadcast(spark):
    df = spark.createDataFrame(
        [(i, u, "en", 10) for i, u, *_ in ROWS],
        "doc_id long, url string, lang string, n_chars long",
    )
    plan = U.blocklist_filter(U.parse(U.normalize(df)))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
