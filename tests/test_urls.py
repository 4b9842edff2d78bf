"""URL parsing / normalization / domain stats (operators/urls.py)."""

import os

from pyspark.sql import functions as F

from spandex_spark.operators.urls import (domain_stats, normalize_url,
                                          registrable_domain, url_parts)


def test_url_parts_closed_form(spark):
    cases = [
        ("https://Sub.Site.Example:8443/a/b?x=1&y=2#frag",
         dict(scheme="https", host="sub.site.example", port=8443,
              path="/a/b", query="x=1&y=2", fragment="frag",
              domain="site.example")),
        ("http://bbc.co.uk/news",
         dict(scheme="http", host="bbc.co.uk", port=None, path="/news",
              query=None, fragment=None, domain="bbc.co.uk")),
        ("https://a.b.example.com/",
         dict(scheme="https", host="a.b.example.com", port=None, path="/",
              query=None, fragment=None, domain="example.com")),
        ("http://192.168.0.1:8080/x",
         dict(scheme="http", host="192.168.0.1", port=8080, path="/x",
              query=None, fragment=None, domain="192.168.0.1")),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    rows = {r["url"]: r for r in url_parts(df).collect()}
    for u, want in cases:
        got = rows[u]
        for k, v in want.items():
            assert got[k] == v, (u, k, got[k], v)


def test_registrable_domain_heuristic(spark):
    cases = [("x.com.au", "x.com.au"), ("deep.x.com.au", "x.com.au"),
             ("example.com", "example.com"), ("localhost", "localhost"),
             ("www.example.org", "example.org")]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = {r["h"]: r["d"] for r in
           df.select("h", registrable_domain(F.col("h")).alias("d")).collect()}
    for h, want in cases:
        assert got[h] == want, (h, got[h])


def test_normalize_url_dedup_collision(spark):
    pairs = [
        ("HTTP://Site.Example:80/a#x", "http://site.example/a"),
        ("http://site.example/a", "http://site.example/a"),
        ("https://site.example:443", "https://site.example/"),
        ("https://site.example/", "https://site.example/"),
        # non-default port and query survive; case of path preserved
        ("https://S.E:8443/P?Q=1#f", "https://s.e:8443/P?Q=1"),
        ("mailto:a@b.c", "mailto:a@b.c"),  # no authority: untouched
    ]
    df = spark.createDataFrame([(u,) for u, _ in pairs], "url string")
    got = {r["url"]: r["url_norm"] for r in normalize_url(df).collect()}
    for u, want in pairs:
        assert got[u] == want, (u, got[u])
    # drop_query mode
    df2 = spark.createDataFrame([("http://h.x/p?sid=42",)], "url string")
    [r] = normalize_url(df2, drop_query=True).collect()
    assert r["url_norm"] == "http://h.x/p"


def test_domain_stats_fixture(spark, fixture_dir):
    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    stats = domain_stats(pages).collect()
    exact = domain_stats(pages, exact_hosts=True).collect()
    assert sorted(map(str, stats)) == sorted(map(str, exact))
    # fixture urls are site{k%97}.example -> 97 registrable domains
    assert len(stats) == 97
    assert sum(r["n_pages"] for r in stats) == pages.count()
    for r in stats:
        assert r["n_hosts"] == 1 and r["domain"].endswith(".example")
        assert r["text_bytes"] > 0


def test_urls_all_jvm(spark, fixture_dir):
    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    plan = (domain_stats(normalize_url(pages))
            ._jdf.queryExecution().executedPlan().toString())
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "Exchange" in plan  # exactly the one groupBy shuffle
    assert plan.count("Exchange hashpartitioning") == 1
