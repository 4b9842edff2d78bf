"""Streaming ingest: batch/stream parity + windowed counts with watermark."""

import os
import shutil

import pytest

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


def test_stream_spatial_tag_matches_batch(spark, fixture_dir, tmp_path):
    """Full PIP tag inside the stream == batch tag over the same files
    (the two-phase broadcast join is stateless, so micro-batching cannot
    change results), zone ids verified against the closed-form lattice."""
    import numpy as np
    from spandex_spark.operators.tag import tag_points
    from spandex_spark.streaming.ingest import stream_tag_pages
    src = _stage_dir(fixture_dir, tmp_path, "in3")
    gaz = spark.read.parquet(os.path.join(fixture_dir, "gazetteer.parquet"))
    zones = spark.read.parquet(os.path.join(fixture_dir, "zones.parquet"))
    out = str(tmp_path / "out3")
    ckpt = str(tmp_path / "ckpt3")
    q = stream_tag_pages(spark, src, out, ckpt, zones, gazetteer=gaz)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    pts = geotag(spark.read.parquet(src), gaz).filter(F.col("lon").isNotNull())
    batch = tag_points(pts, zones, poly_id_col="zone_id",
                       point_id_col="url", level=9,
                       poly_attr_cols=("zclass",), assume_disjoint=True)
    a = {(r.url, r.zone_id) for r in got.select("url", "zone_id").collect()}
    b = {(r.url, r.zone_id) for r in batch.select("url", "zone_id").collect()}
    assert a == b and len(a) == batch.count() > 0
    for r in got.select("lon", "lat", "zone_id").collect():
        assert -10 <= r.lon < 10 and -10 <= r.lat < 10  # inner semantics
        assert r.zone_id == int((np.floor(r.lat) + 10) * 20
                                + (np.floor(r.lon) + 10))


def test_stream_zone_rates_matches_batch(spark, fixture_dir, tmp_path):
    """Windowed per-zone streaming counts == batch groupBy over the same
    files (watermark never drops rows in availableNow backfill)."""
    from spandex_spark.operators.tag import tag_points
    from spandex_spark.streaming.ingest import stream_zone_rates
    src = _stage_dir(fixture_dir, tmp_path, "in4")
    gaz = spark.read.parquet(os.path.join(fixture_dir, "gazetteer.parquet"))
    zones = spark.read.parquet(os.path.join(fixture_dir, "zones.parquet"))
    q = stream_zone_rates(spark, src, zones, gazetteer=gaz,
                          query_name="zr_test")
    q.awaitTermination(120)
    got = {(r.window_start, r.zone_id): r.n_pages
           for r in spark.sql("select * from zr_test").collect()}
    pts = geotag(spark.read.parquet(src), gaz).filter(F.col("lon").isNotNull())
    batch = (tag_points(pts, zones, poly_id_col="zone_id", point_id_col="url",
                        level=9, assume_disjoint=True)
             .groupBy(F.window("warc_ts", "1 hour").alias("w"), "zone_id")
             .agg(F.count("*").alias("n")))
    want = {(r.w.start, r.zone_id): r.n for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stream_append_icebergish_table(spark, fixture_dir, tmp_path):
    """Streaming -> IcebergishTable sink: micro-batches land as atomic
    snapshots, the streamed table equals the batch pipeline's output, and
    time travel / pruning work on streamed snapshots."""
    from pyspark.sql import functions as F
    from spandex_spark.geotag import geotag
    from spandex_spark.streaming.ingest import stream_append_table
    from spandex_spark.tables import IcebergishTable
    src = _stage_dir(fixture_dir, tmp_path, "in_tbl")
    troot = str(tmp_path / "stream_tbl")
    q = stream_append_table(spark, src, troot, str(tmp_path / "ckpt"))
    q.awaitTermination()
    t = IcebergishTable(troot)
    snaps = t.snapshots()
    assert len(snaps) >= 1
    assert all(s["partition_values"].get("stream_batch") is not None
               for s in snaps)
    streamed = t.read(spark)
    batch = geotag(spark.read.parquet(src), None)
    assert streamed.count() == batch.count()
    a = {r.url: (r.lon, r.lat) for r in streamed.collect()}
    b = {r.url: (r.lon, r.lat) for r in batch.collect()}
    assert a == b
    # a second run of the same drained source appends nothing new
    q2 = stream_append_table(spark, src, troot, str(tmp_path / "ckpt"))
    q2.awaitTermination()
    assert IcebergishTable(troot).read(spark).count() == batch.count()


def test_stream_read_table_tails_appends(spark, tmp_path):
    """IcebergishTable as a streaming SOURCE: existing snapshots arrive,
    then a NEW append is picked up by the running stream."""
    import time
    from pyspark.sql import functions as F
    from spandex_spark.streaming.ingest import stream_read_table
    from spandex_spark.tables import IcebergishTable
    troot = str(tmp_path / "src_tbl")
    t = IcebergishTable(troot)
    t.append(spark.range(0, 100).select(F.col("id").alias("k"),
                                        (F.col("id") * 2).alias("v")))
    stream = stream_read_table(spark, troot)
    q = (stream.writeStream.format("memory").queryName("tbl_tail")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) n from tbl_tail").collect()[0].n == 100:
                break
            time.sleep(0.5)
        assert spark.sql("select count(*) n from tbl_tail").collect()[0].n == 100
        t.append(spark.range(100, 150).select(F.col("id").alias("k"),
                                              (F.col("id") * 2).alias("v")))
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) n from tbl_tail").collect()[0].n == 150:
                break
            time.sleep(0.5)
        rows = spark.sql("select * from tbl_tail").collect()
        assert len(rows) == 150
        assert {r.k for r in rows} == set(range(150))
        assert all(r.v == r.k * 2 for r in rows)
    finally:
        q.stop()


def test_stream_read_table_empty_raises(spark, tmp_path):
    from spandex_spark.streaming.ingest import stream_read_table
    with pytest.raises(FileNotFoundError):
        stream_read_table(spark, str(tmp_path / "nope"))


def test_stream_tile_heatmap_matches_batch(spark, fixture_dir, tmp_path):
    """Windowed streaming heat tiles == batch tile counts over the same
    files at the same zoom."""
    from spandex_spark.operators.tiles import tile_xy
    from spandex_spark.streaming.ingest import stream_tile_heatmap
    src = _stage_dir(fixture_dir, tmp_path, "in_hm")
    gaz = spark.read.parquet(os.path.join(fixture_dir, "gazetteer.parquet"))
    q = stream_tile_heatmap(spark, src, gazetteer=gaz, zoom=8,
                            query_name="hm_test")
    q.awaitTermination(120)
    got = {(r.window_start, r.x, r.y): r.n_pages
           for r in spark.sql("select * from hm_test").collect()}
    assert all(r.z == 8 for r in spark.sql("select * from hm_test").collect())
    pts = geotag(spark.read.parquet(src), gaz).filter(F.col("lon").isNotNull())
    x, y = tile_xy(F.col("lon"), F.col("lat"), 8)
    batch = (pts.select("warc_ts", x.alias("x"), y.alias("y"))
             .groupBy(F.window("warc_ts", "1 hour").alias("w"), "x", "y")
             .agg(F.count("*").alias("n")))
    want = {(r.w.start, r.x, r.y): r.n for r in batch.collect()}
    assert got == want and len(got) > 0
