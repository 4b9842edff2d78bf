"""ingest_pages (pipeline.py): raw crawl -> canonical pages with
extraction, earliest-wins canonical-URL dedup, optional line dedup."""

import os

from pyspark.sql import functions as F

from spandex_spark.pipeline import flagship_tag_knn, ingest_pages


def _raw(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")


def _r(url, ts, body):
    import datetime
    return (url, datetime.datetime.fromisoformat(ts),
            bytearray(b"<html><body>" + body.encode() + b"</body></html>"))


def test_extraction_fills_text(spark):
    raw = _raw(spark, [_r("http://a.x/p", "2026-01-01T00:00:00", "hello a")])
    [row] = ingest_pages(raw).collect()
    assert row["text"] == "hello a"


def test_url_dedup_earliest_wins_across_variants(spark):
    rows = [_r("HTTP://A.X:80/p#frag", "2026-01-02T00:00:00", "late fetch"),
            _r("http://a.x/p", "2026-01-01T00:00:00", "early fetch"),
            _r("http://a.x/q", "2026-01-03T00:00:00", "other page")]
    out = ingest_pages(_raw(spark, rows)).collect()
    assert len(out) == 2
    by_text = {r["text"]: r for r in out}
    assert "early fetch" in by_text      # earliest variant survives
    assert "late fetch" not in by_text
    assert by_text["early fetch"]["url"] == "http://a.x/p"
    assert "other page" in by_text


def test_line_dedup_hook(spark):
    rows = [_r("http://a.x/1", "2026-01-01T00:00:00", "BANNER\none"),
            _r("http://a.x/2", "2026-01-02T00:00:00", "BANNER\ntwo")]
    out = {r["url"]: r["text"] for r in
           ingest_pages(_raw(spark, rows), dedup_lines=True).collect()}
    assert out["http://a.x/1"] == "BANNER\none"
    assert out["http://a.x/2"] == "two"


def test_ingest_feeds_flagship_byte_identically(spark, fixture_dir):
    """Raw (url, warc_ts, html) fixture through ingest_pages == the
    carried pages table through the same flagship job, row for row."""
    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    raw = pages.select("url", "warc_ts", "html", "lang")
    ld = lambda n: spark.read.parquet(
        os.path.join(fixture_dir, n + ".parquet"))
    ing = ingest_pages(raw).select("url", "warc_ts", "html", "text", "lang")
    a = flagship_tag_knn(spark, ing, ld("gazetteer"), ld("zones"),
                         ld("poi"), k=3)
    b = flagship_tag_knn(spark, pages, ld("gazetteer"), ld("zones"),
                         ld("poi"), k=3)
    ra = sorted(map(str, a.collect()))
    rb = sorted(map(str, b.collect()))
    assert ra == rb and len(ra) > 0


def test_ingest_plan_is_jvm_only(spark, fixture_dir):
    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    raw = pages.select("url", "warc_ts", "html")
    plan = (ingest_pages(raw)
            ._jdf.queryExecution().executedPlan().toString())
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the url dedup