"""robots.txt (operators/robots.py): RFC 9309 / Google reference-parser
precedence cases, group selection, wildcard/anchor translation,
allow-by-absence, and the JVM-only page path."""

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.robots import (
    _parse_one, _pattern_regex, parse_robots, robots_filter)

EXAMPLE = """
# fishing site
User-agent: googlebot
Disallow: /private/

User-agent: *
Disallow: /fish
Allow: /fish/salmon
Disallow: /*.php$
Allow: /
"""


def _pages(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def _rules(spark, body, agent="*", host="example.com"):
    df = spark.createDataFrame([(host, body)],
                               "host string, robots_txt string")
    return parse_robots(df, agent=agent)


def test_pattern_translation():
    assert _pattern_regex("/fish") == "^/fish"
    assert _pattern_regex("/*.php$") == "^/.*\\.php$"
    assert _pattern_regex("/a+b") == "^/a\\+b"


def test_group_selection_exact_beats_star():
    rules = _parse_one(EXAMPLE, "googlebot")
    assert [(a, p) for a, p, _ in rules] == [(False, len("/private/"))]
    star = _parse_one(EXAMPLE, "otherbot")
    assert len(star) == 4


def test_longest_match_and_tie_break(spark):
    rules = _rules(spark, EXAMPLE)
    urls = ["http://example.com/fish/salmon.html",   # allow (longer)
            "http://example.com/fishing",            # /fish disallow...
            "http://example.com/index.php",          # $ anchor disallow
            "http://example.com/index.php?x=1",      # no $ match -> allow
            "http://example.com/other"]              # Allow: /
    got = {r["url"]: r["crawl_allowed"] for r in
           robots_filter(_pages(spark, urls), rules,
                         keep_denied=True).collect()}
    assert got["http://example.com/fish/salmon.html"] is True
    assert got["http://example.com/fishing"] is False
    assert got["http://example.com/index.php"] is False
    assert got["http://example.com/index.php?x=1"] is True
    assert got["http://example.com/other"] is True


def test_equal_length_tie_allow_wins(spark):
    body = "User-agent: *\nAllow: /page\nDisallow: /page"
    rules = _rules(spark, body)
    got = robots_filter(_pages(spark, ["http://example.com/page"]),
                        rules, keep_denied=True).collect()[0]
    assert got["crawl_allowed"] is True


def test_unlisted_host_and_empty_disallow(spark):
    rules = _rules(spark, "User-agent: *\nDisallow:\n")
    # empty Disallow -> no rules at all -> zero rule rows
    assert rules.count() == 0
    pages = _pages(spark, ["http://example.com/x",
                           "http://other.com/anything"])
    kept = robots_filter(pages, rules).collect()
    assert len(kept) == 2


def test_filter_drops_denied_by_default(spark):
    rules = _rules(spark, "User-agent: *\nDisallow: /secret/")
    pages = _pages(spark, ["http://example.com/secret/a",
                           "http://example.com/open"])
    kept = [r["url"] for r in robots_filter(pages, rules).collect()]
    assert kept == ["http://example.com/open"]


def test_case_insensitive_keys_and_comments(spark):
    body = "USER-AGENT: *  # all bots\nDISALLOW: /a # hidden\n"
    rules = _rules(spark, body)
    row = rules.collect()[0]
    assert row["allow"] is False and row["regex"] == "^/a"


def test_page_side_stays_jvm(spark):
    rules = _rules(spark, EXAMPLE)
    df = robots_filter(_pages(spark, ["http://example.com/x"]), rules,
                       keep_denied=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # the only Python in the whole job parsed the RULES (upstream,
    # rule-sized); the page side joins broadcast and stays codegen
    assert "BroadcastHashJoin" in final
