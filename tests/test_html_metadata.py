"""extract_metadata (operators/html.py): field extraction across
attribute orders, entity decoding, noindex derivation, NULL
conventions, JVM-only plan."""

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.html import extract_metadata

PAGE = b"""<!doctype html>
<html lang="EN-us">
<head>
  <!-- <title>commented out</title> -->
  <title> Fish &amp; Chips </title>
  <meta content="Best fish &quot;shop&quot;" name="description">
  <link href="https://example.com/fish" rel="canonical">
  <base href="https://example.com/">
  <meta property="og:title" content="Fish!">
  <meta name="robots" content="NOINDEX, nofollow">
</head><body>hi</body></html>
"""


def _df(spark, html_bytes):
    return spark.createDataFrame([("u", html_bytes)],
                                 "url string, html binary")


def test_all_fields(spark):
    r = extract_metadata(_df(spark, PAGE)).collect()[0]
    assert r["page_title"] == "Fish & Chips"
    assert r["meta_description"] == 'Best fish "shop"'
    assert r["canonical_url"] == "https://example.com/fish"
    assert r["base_href"] == "https://example.com/"
    assert r["og_title"] == "Fish!"
    assert r["html_lang"] == "en-us"
    assert r["meta_robots"] == "noindex, nofollow"
    assert r["noindex"] is True


def test_attribute_order_both_ways(spark):
    a = b'<meta name="description" content="A">'
    b = b'<meta content="A" name="description">'
    for payload in (a, b):
        r = extract_metadata(_df(spark, payload)).collect()[0]
        assert r["meta_description"] == "A"


def test_absent_fields_are_null(spark):
    r = extract_metadata(_df(spark, b"<html><body>x</body></html>")) \
        .collect()[0]
    for c in ("page_title", "meta_description", "canonical_url",
              "base_href", "og_title", "html_lang", "meta_robots"):
        assert r[c] is None, c
    assert r["noindex"] is False
    # NULL html propagates NULLs too
    rn = extract_metadata(_df(spark, None)).collect()[0]
    assert rn["page_title"] is None and rn["noindex"] is False


def test_commented_title_ignored(spark):
    r = extract_metadata(_df(
        spark, b"<!-- <title>no</title> --><title>yes</title>")) \
        .collect()[0]
    assert r["page_title"] == "yes"


def test_plan_stays_jvm(spark):
    plan = extract_metadata(_df(spark, PAGE)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]
