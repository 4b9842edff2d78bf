"""Streaming ingest: batch/stream parity + windowed counts with watermark."""

import os
import shutil

from pyspark.sql import functions as F

from spandex_spark.geotag import geotag
from spandex_spark.streaming import stream_geotag_pages
from spandex_spark.streaming.ingest import stream_page_rates


def _stage_dir(fixture_dir, tmp_path, name="in"):
    """File stream sources need a DIRECTORY of files, not a single file."""
    d = tmp_path / name
    d.mkdir()
    shutil.copy(os.path.join(fixture_dir, "pages.parquet"),
                str(d / "part-000.parquet"))
    return str(d)


def test_stream_matches_batch(spark, fixture_dir, tmp_path):
    src = _stage_dir(fixture_dir, tmp_path)
    gaz = spark.read.parquet(os.path.join(fixture_dir, "gazetteer.parquet"))
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_geotag_pages(spark, src, out, ckpt, gazetteer=gaz)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    batch = geotag(spark.read.parquet(src), gaz)
    assert got.count() == batch.count()
    a = {(r.url, r.lon, r.lat, r.tag_source) for r in
         got.select("url", "lon", "lat", "tag_source").collect()}
    b = {(r.url, r.lon, r.lat, r.tag_source) for r in
         batch.select("url", "lon", "lat", "tag_source").collect()}
    assert a == b
    # exactly-once on restart: re-running the drained stream adds nothing
    q2 = stream_geotag_pages(spark, src, out, ckpt, gazetteer=gaz)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == batch.count()


def test_windowed_rates(spark, fixture_dir, tmp_path):
    src = _stage_dir(fixture_dir, tmp_path, "in2")
    q = stream_page_rates(spark, src, "unused", window="1 hour")
    q.awaitTermination(120)
    got = spark.sql("select sum(n_pages) as n from page_rates").collect()[0].n
    assert got == spark.read.parquet(src).count()
