"""HTML -> text extraction (operators/html.py): the north-rule invariant
(fixture pages round-trip byte-identically), entity/tag handling on both
paths, full-mode numeric entities, and the JVM-path plan guarantee."""

import os

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.html import extract_text, verify_extraction


def _pages(spark, fixture_dir):
    return spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))


def test_fixture_roundtrip_byte_identical(spark, fixture_dir):
    # the north-rule invariant: extracting the html column reproduces the
    # carried text column byte-for-byte, for every row
    pages = _pages(spark, fixture_dir)
    got = extract_text(pages, out_col="_x")
    n_bad = got.filter(F.col("_x") != F.col("text")).count()
    assert n_bad == 0
    assert got.count() == pages.count()


def test_verify_extraction_gate(spark, fixture_dir):
    ok = verify_extraction(_pages(spark, fixture_dir))
    row = ok.agg(F.min("ok").alias("all_ok"),
                 F.count("*").alias("n")).collect()[0]
    assert row["all_ok"] is True and row["n"] > 0


CASES = [
    (b"<html><body>plain text</body></html>", "plain text"),
    (b"a <b>bold</b> move", "a bold move"),
    (b"<p>x</p><!-- secret --><p>y</p>", "xy"),
    (b"keep<script type='t'>var a = '<p>no</p>';</script>this", "keepthis"),
    (b"s<style>p { color: red }</style>t", "st"),
    (b"n<noscript><img src=x></noscript>o", "no"),
    (b"&lt;tag&gt; &amp; &quot;q&quot; &#39;a&#39; &apos;b&apos;",
     "<tag> & \"q\" 'a' 'b'"),
    # amp decoded LAST: &amp;lt; is the literal text "&lt;"
    (b"&amp;lt;", "&lt;"),
    (b"x&nbsp;y", "x\u00a0y"),  # NBSP, same as stdlib html.unescape
    (b"<a href='u?a=1&b=2'>link</a>", "link"),
    (b"", ""),
]


@pytest.mark.parametrize("mode", ["jvm", "full"])
def test_tag_and_entity_cases(spark, mode):
    df = spark.createDataFrame(
        [(i, bytearray(h)) for i, (h, _) in enumerate(CASES)],
        "i int, html binary")
    out = {r["i"]: r["x"]
           for r in extract_text(df, out_col="x", mode=mode).collect()}
    for i, (_, want) in enumerate(CASES):
        assert out[i] == want, (mode, CASES[i][0], out[i])


def test_full_mode_numeric_entities(spark):
    df = spark.createDataFrame(
        [(1, bytearray("caf&#233; &#x2603; &copy;".encode()))],
        "i int, html binary")
    [r] = extract_text(df, out_col="x", mode="full").collect()
    assert r["x"] == "café ☃ ©"
    # jvm path documents pass-through for references it doesn't decode
    [r2] = extract_text(df, out_col="x", mode="jvm").collect()
    assert r2["x"] == "caf&#233; &#x2603; &copy;"


def test_block_sep_mode(spark):
    h = b"<html><head><title>T</title></head><body><p> a </p>\n<p>b</p><div>c</div></body></html>"
    df = spark.createDataFrame([(1, bytearray(h))], "i int, html binary")
    [r] = extract_text(df, out_col="x", mode="jvm",
                       block_sep=" ").collect()
    assert r["x"] == "T a b c"
    [rf] = extract_text(df, out_col="x", mode="full",
                        block_sep=" ").collect()
    assert rf["x"] == "T a b c"


def test_null_html_yields_null(spark):
    df = spark.createDataFrame([(1, None)], "i int, html binary")
    for mode in ("jvm", "full"):
        [r] = extract_text(df, out_col="x", mode=mode).collect()
        assert r["x"] is None


def test_jvm_path_has_no_python_operators(spark, fixture_dir):
    plan = (extract_text(_pages(spark, fixture_dir))
            ._jdf.queryExecution().executedPlan().toString())
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan


def test_bad_mode_raises(spark, fixture_dir):
    with pytest.raises(ValueError):
        extract_text(_pages(spark, fixture_dir), mode="nope")
