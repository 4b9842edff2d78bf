"""Projected-to-projected transform (operators/reproject.py::
transform): round-trip identity through a third CRS, 4326 endpoint
degradation, same-SRID passthrough, and cross-family chains
(state-plane LCC -> UTM -> Albers) closing to sub-mm."""

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.reproject import (transform, reproject,
                                               reproject_inverse)


def _pts(spark):
    # California-ish lattice: valid for EPSG:26943 (CA zone 3), UTM 10N,
    # and EPSG:3310 (California Albers)
    rows = [(i, -122.0 + i * 0.05, 37.0 + i * 0.04) for i in range(40)]
    return spark.createDataFrame(rows, "pt long, lon double, lat double")


def test_4326_endpoints_degrade_to_single_leg(spark):
    pts = _pts(spark)
    via = transform(pts, from_srid=4326, to_srid=26943,
                    x_col="lon", y_col="lat")
    direct = reproject(pts, to_srid=26943)
    a = {r.pt: (r.tx, r.ty) for r in via.collect()}
    b = {r.pt: (r.x, r.y) for r in direct.collect()}
    for k in a:
        assert a[k][0] == pytest.approx(b[k][0], abs=1e-9)
        assert a[k][1] == pytest.approx(b[k][1], abs=1e-9)


def test_projected_to_projected_round_trip(spark):
    pts = _pts(spark)
    sp = reproject(pts, to_srid=26943)                      # lcc meters
    utm = transform(sp, from_srid=26943, to_srid=32610)     # -> utm 10n
    back = transform(utm, from_srid=32610, to_srid=26943,
                     x_col="tx", y_col="ty", out_x="bx", out_y="by")
    rows = back.select("pt", "x", "y", "bx", "by").collect()
    for r in rows:
        assert r.bx == pytest.approx(r.x, abs=1e-3)         # sub-mm
        assert r.by == pytest.approx(r.y, abs=1e-3)


def test_chain_through_albers_to_4326(spark):
    pts = _pts(spark)
    sp = reproject(pts, to_srid=3310)                       # ca albers
    ll = transform(sp, from_srid=3310, to_srid=4326)
    rows = ll.join(pts.select("pt", F.col("lon").alias("lon0"),
                              F.col("lat").alias("lat0")), "pt").collect()
    for r in rows:
        assert r.tx == pytest.approx(r.lon0, abs=1e-9)
        assert r.ty == pytest.approx(r.lat0, abs=1e-9)


def test_same_srid_passthrough(spark):
    pts = _pts(spark).withColumnRenamed("lon", "x") \
        .withColumnRenamed("lat", "y")
    out = transform(pts, from_srid=26943, to_srid=26943)
    for r in out.collect():
        assert r.tx == r.x and r.ty == r.y
