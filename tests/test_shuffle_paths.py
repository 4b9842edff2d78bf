"""Non-broadcast (shuffle) paths must equal the broadcast paths — the
large-polygon-layer / large-overlay-layer route used when the feature side
doesn't fit in executor memory."""

import os

from pyspark.sql import functions as F

from spandex_spark.geotag import geotag
from spandex_spark.operators import tag_points, proportion_overlap


def test_tag_shuffle_path_matches_broadcast(spark, fixture_dir):
    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    gaz = spark.read.parquet(os.path.join(fixture_dir, "gazetteer.parquet"))
    zones = spark.read.parquet(os.path.join(fixture_dir, "zones.parquet"))
    pts = geotag(pages, gaz).filter(F.col("lon").isNotNull())
    a = {(r.url, r.zone_id) for r in
         tag_points(pts, zones, poly_id_col="zone_id", point_id_col="url",
                    broadcast_polys=True).collect()}
    b = {(r.url, r.zone_id) for r in
         tag_points(pts, zones, poly_id_col="zone_id", point_id_col="url",
                    broadcast_polys=False).collect()}
    assert a == b


def test_overlay_shuffle_path_matches_broadcast(spark, fixture_dir):
    zones = spark.read.parquet(os.path.join(fixture_dir, "zones.parquet"))
    parcels = spark.read.parquet(os.path.join(fixture_dir, "parcels.parquet"))
    a = {(r.parcel_id, r.zone_id, round(r.ix_area, 12)) for r in
         proportion_overlap(parcels, zones, target_id_col="parcel_id",
                            overlay_id_col="zone_id", keep_pairs=True,
                            broadcast_overlays=True).collect()}
    b = {(r.parcel_id, r.zone_id, round(r.ix_area, 12)) for r in
         proportion_overlap(parcels, zones, target_id_col="parcel_id",
                            overlay_id_col="zone_id", keep_pairs=True,
                            broadcast_overlays=False).collect()}
    assert a == b
