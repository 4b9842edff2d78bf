"""parse_sitemap (operators/urls.py): urlset vs sitemapindex, lastmod
pairing, entity decoding, malformed input, JVM-only plan."""

from pyspark.sql import functions as F

from spandex_spark.operators.urls import parse_sitemap

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://ex.com/a?x=1&amp;y=2</loc>
       <lastmod>2026-01-05</lastmod><priority>0.8</priority></url>
  <url><loc> https://ex.com/b </loc></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://ex.com/maps/1.xml</loc>
           <lastmod>2026-02-01T10:00:00Z</lastmod></sitemap>
</sitemapindex>"""


def _df(spark, xml):
    return spark.createDataFrame([("https://ex.com/sitemap.xml", xml)],
                                 "url string, xml string")


def test_urlset(spark):
    rows = parse_sitemap(_df(spark, URLSET)).collect()
    assert len(rows) == 2
    by_loc = {r["loc"]: r for r in rows}
    assert "https://ex.com/a?x=1&y=2" in by_loc          # entity decoded
    assert by_loc["https://ex.com/a?x=1&y=2"]["lastmod"] == "2026-01-05"
    assert by_loc["https://ex.com/b"]["lastmod"] is None  # trimmed loc
    assert all(r["kind"] == "urlset" for r in rows)


def test_sitemapindex(spark):
    rows = parse_sitemap(_df(spark, INDEX)).collect()
    assert len(rows) == 1
    assert rows[0]["kind"] == "sitemapindex"
    assert rows[0]["loc"] == "https://ex.com/maps/1.xml"
    assert rows[0]["lastmod"].startswith("2026-02-01")


def test_malformed_and_plan(spark):
    junk = _df(spark, "<html>not a sitemap</html>")
    assert parse_sitemap(junk).count() == 0
    frame = parse_sitemap(_df(spark, URLSET))
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_frontier_batches(spark):
    from spandex_spark.operators.urls import frontier_batches
    rows = [(f"http://h{i % 3}.com/p{j}", float(j))
            for i in range(3) for j in range(25)]
    df = spark.createDataFrame(rows, "url string, score double")
    out = frontier_batches(df, per_host=10).collect()
    per = {}
    for r in out:
        per.setdefault((r["host"], r["fetch_batch"]), []).append(r["url"])
    # no batch exceeds per_host for its host; batches are 0..2
    assert all(len(v) <= 10 for v in per.values())
    assert {b for (_h, b) in per} == {0, 1, 2}
    # priority ordering puts high scores in batch 0
    pri = frontier_batches(df, per_host=10, priority_col="score")
    b0 = [r["url"] for r in pri.collect()
          if r["fetch_batch"] == 0 and r["host"] == "h0.com"]
    assert all(int(u.rsplit("p", 1)[1]) >= 15 for u in b0)
    import pytest as _pt
    with _pt.raises(ValueError):
        frontier_batches(df, per_host=0)
