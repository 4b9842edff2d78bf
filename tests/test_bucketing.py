"""Bucketed co-located spatial join: plan shape + equality vs tag_points."""

import os
import re

import pytest
from pyspark.sql import functions as F

from spandex_spark.bucketing import (tag_points_bucketed, write_bucketed,
                                     write_points_bucketed,
                                     write_polygons_bucketed)
from spandex_spark.operators.tag import tag_points
from spandex_spark.sources.grids import derived_points, zones_df


def _pts(spark):
    """4000 lattice points inside the zone window + 16 far outside it
    (the NULL-tag path must survive the bucketed join too)."""
    inside = derived_points(
        spark.range(4000).select(F.col("id").alias("pt_id")), "pt_id")
    outside = spark.range(4000, 4016).select(
        F.col("id").alias("pt_id"),
        (F.lit(100.0) + F.col("id") % 7).alias("lon"),
        (F.lit(40.0) + F.col("id") % 5).alias("lat"))
    return inside.unionByName(outside)


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    """Points + zones written as cell-bucketed tables (n_buckets=8)."""
    base = str(tmp_path_factory.mktemp("bucketed"))
    write_points_bucketed(_pts(spark), "t_pts_b", level=9, n_buckets=8,
                          path=os.path.join(base, "pts"))
    write_polygons_bucketed(zones_df(spark), "t_zones_b",
                            poly_id_col="zone_id", level=9, n_buckets=8,
                            path=os.path.join(base, "zones"))
    yield "t_pts_b", "t_zones_b"
    spark.sql("DROP TABLE IF EXISTS t_pts_b")
    spark.sql("DROP TABLE IF EXISTS t_zones_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    """Both sides bucketed on cell with the same count -> the cell join
    plans as SortMergeJoin over aligned buckets with ZERO Exchange (the
    persisted-shuffle contract). Auto-broadcast is disabled so the small
    fixture can't cheat its way around the claim."""
    pts_t, zones_t = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = tag_points_bucketed(spark, pts_t, zones_t,
                                  poly_id_col="zone_id",
                                  point_id_col="pt_id",
                                  assume_disjoint=True)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert not re.search(r"Exchange (?:hash|range)partitioning", plan), \
            "bucketed cell join must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_tag_equals_broadcast_tag(spark, bucketed_pair):
    """tag_points_bucketed == tag_points (broadcast path) row-for-row,
    including points in no zone (NULL) and exact boundary semantics."""
    pts_t, zones_t = bucketed_pair
    got = tag_points_bucketed(spark, pts_t, zones_t,
                              poly_id_col="zone_id", point_id_col="pt_id")
    want = tag_points(_pts(spark), zones_df(spark), poly_id_col="zone_id",
                      point_id_col="pt_id", level=9)
    g = {r["pt_id"]: r["zone_id"] for r in got.collect()}
    w = {r["pt_id"]: r["zone_id"] for r in want.collect()}
    assert g == w
    assert any(v is None for v in w.values())  # fixture has out-of-zone pts


def test_bucketed_disjoint_matches_inner_semantics(spark, bucketed_pair):
    """assume_disjoint drops unmatched points (inner semantics), matching
    the non-null subset of the resolved output."""
    pts_t, zones_t = bucketed_pair
    resolved = tag_points_bucketed(spark, pts_t, zones_t,
                                   poly_id_col="zone_id",
                                   point_id_col="pt_id")
    inner = tag_points_bucketed(spark, pts_t, zones_t,
                                poly_id_col="zone_id",
                                point_id_col="pt_id",
                                assume_disjoint=True)
    r = {row["pt_id"]: row["zone_id"] for row in resolved.collect()
         if row["zone_id"] is not None}
    i = {row["pt_id"]: row["zone_id"] for row in inner.collect()}
    assert i == r


def test_write_bucketed_records_bucket_spec(spark, tmp_path):
    """The catalog carries the bucket spec (what makes later sessions'
    joins exchange-free without re-reading this code)."""
    df = spark.range(100).select(
        F.col("id").alias("cell"), (F.col("id") * 2).alias("v"))
    write_bucketed(df, "t_spec_b", n_buckets=4,
                   path=str(tmp_path / "spec"))
    try:
        desc = spark.sql("DESCRIBE TABLE EXTENDED t_spec_b").collect()
        txt = "\n".join(f"{r.col_name} {r.data_type}" for r in desc)
        assert "Num Buckets 4" in txt
        assert "Bucket Columns [`cell`]" in txt
    finally:
        spark.sql("DROP TABLE IF EXISTS t_spec_b")
