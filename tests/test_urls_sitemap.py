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
