"""Geodesic (meters) buffering: AEQD round-trips, exact great-circle
point buffers, polygon buffers through the local tangent frame."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark import geom as G
from spandex_spark.operators.buffer import buffer_points, buffer_polygons

GEOM_SCHEMA = ("pid long, geom struct<kind:tinyint, xs:array<double>,"
               " ys:array<double>, ring_offsets:array<int>,"
               " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def test_aeqd_roundtrip_sub_mm():
    rng = np.random.default_rng(5)
    lon0, lat0 = -122.4, 37.8
    lon = lon0 + rng.uniform(-2, 2, 500)
    lat = lat0 + rng.uniform(-2, 2, 500)
    x, y = G.lonlat_to_aeqd(lon, lat, lon0, lat0)
    lon2, lat2 = G.aeqd_to_lonlat(x, y, lon0, lat0)
    err_m = G.haversine_m(lon, lat, lon2, lat2)
    assert float(np.max(err_m)) < 1e-3  # sub-mm


def test_aeqd_center_and_distance_exact():
    # distance from the tangent point is exact by construction
    lon0, lat0 = 10.0, 45.0
    lon = np.array([10.0, 11.0, 10.0, 13.0])
    lat = np.array([45.0, 45.0, 47.0, 41.0])
    x, y = G.lonlat_to_aeqd(lon, lat, lon0, lat0)
    assert x[0] == 0.0 and y[0] == 0.0
    d_true = G.haversine_m(np.full(4, lon0), np.full(4, lat0), lon, lat)
    assert np.allclose(np.hypot(x, y), d_true, rtol=1e-12, atol=1e-6)


def test_geodesic_point_buffer_vertices_exact(spark):
    pts = spark.createDataFrame([(1, -60.0, 55.0)],
                                "pid long, lon double, lat double")
    out = buffer_points(pts, radius=50_000.0, segments=32,
                        metric="geodesic").collect()[0]["geom"]
    xs, ys = np.array(out["xs"]), np.array(out["ys"])
    assert xs.shape[0] == 32
    d = G.haversine_m(np.full(32, -60.0), np.full(32, 55.0), xs, ys)
    assert np.allclose(d, 50_000.0, rtol=1e-9)  # every vertex at radius
    # CCW like the planar path
    assert G.shoelace_area(xs, ys) > 0


def test_geodesic_polygon_buffer_closed_form_per_latitude(spark):
    # a 0.01-deg square buffered by 1 km at lat 0 and lat 60: each must
    # hit the rounded-RECT closed form for its own METRIC side lengths
    # (w = 0.01 deg x cos(lat), h = 0.01 deg) - the lat-60 square is a
    # 2:1 metric rectangle, which is exactly why buffering in meters
    # needs the local tangent frame
    def sq(pid, lat_c):
        d = 0.005
        xs = [10 - d, 10 + d, 10 + d, 10 - d]
        ys = [lat_c - d, lat_c - d, lat_c + d, lat_c + d]
        return (pid, {"kind": 3, "xs": xs, "ys": ys,
                      "ring_offsets": [0, 4],
                      "bbox": {"minx": min(xs), "miny": min(ys),
                               "maxx": max(xs), "maxy": max(ys)}})
    df = spark.createDataFrame([sq(1, 0.0), sq(2, 60.0)], GEOM_SCHEMA)
    out = {r["pid"]: r["g"] for r in buffer_polygons(
        df, radius=1000.0, segments=16, metric="geodesic",
        out_col="g").collect()}
    r, s = 1000.0, 16
    deg_m = math.pi / 180.0 * G.EARTH_RADIUS_M
    for pid, lat_c in ((1, 0.0), (2, 60.0)):
        g = out[pid]
        xs, ys = np.array(g["xs"]), np.array(g["ys"])
        area = G.spherical_rings_area(xs, ys, np.array(g["ring_offsets"]))
        w = 0.01 * deg_m * math.cos(math.radians(lat_c))
        h = 0.01 * deg_m
        want = (w * h + 2 * (w + h) * r
                + 0.5 * s * r * r * math.sin(2 * math.pi / s))
        assert area == pytest.approx(want, rel=2e-3), (pid, area, want)


def test_geodesic_concave_polygon_buffer(spark):
    # L-shape in degrees near lat 45 through the arrangement path
    xs = [0.0, 0.02, 0.02, 0.01, 0.01, 0.0]
    ys = [45.0, 45.0, 45.01, 45.01, 45.02, 45.02]
    df = spark.createDataFrame(
        [(1, {"kind": 3, "xs": xs, "ys": ys, "ring_offsets": [0, 6],
              "bbox": {"minx": 0.0, "miny": 45.0, "maxx": 0.02,
                       "maxy": 45.02}})], GEOM_SCHEMA)
    g = buffer_polygons(df, radius=200.0, segments=16,
                        metric="geodesic", out_col="g").collect()[0]["g"]
    assert g is not None
    # result contains the original ring: every input vertex has positive
    # distance to the buffered boundary, and area grew
    bx, by = np.array(g["xs"]), np.array(g["ys"])
    a_buf = G.spherical_rings_area(bx, by, np.array(g["ring_offsets"]))
    a_in = G.spherical_rings_area(np.array(xs), np.array(ys),
                                  np.array([0, 6]))
    assert a_buf > a_in
    # closed form (planar in the tangent frame, radius in meters):
    # A + P*r + 5*(s/4)*(r^2 sin(2pi/s)/2) - r^2, with A and P taken
    # from the projected ring itself
    px, py = G.lonlat_to_aeqd(np.array(xs), np.array(ys), 0.01, 45.01)
    a_pl = G.shoelace_area(px, py)
    per = float(np.sum(np.hypot(np.diff(np.r_[px, px[0]]),
                                np.diff(np.r_[py, py[0]]))))
    r, s = 200.0, 16
    want = (a_pl + per * r + 5 * (s / 4) * (r * r * math.sin(
        2 * math.pi / s) / 2) - r * r)
    assert a_buf == pytest.approx(want, rel=5e-3), (a_buf, want)


def test_planar_paths_unchanged(spark):
    pts = spark.createDataFrame([(1, 2.0, 3.0)],
                                "pid long, lon double, lat double")
    g = buffer_points(pts, radius=1.0, segments=8).collect()[0]["geom"]
    assert len(g["xs"]) == 8 and g["bbox"]["minx"] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        buffer_points(pts, radius=1.0, metric="nope")
    with pytest.raises(ValueError):
        buffer_polygons(spark.createDataFrame([], GEOM_SCHEMA),
                        radius=1.0, metric="nope")


def test_antimeridian_ring_buffers_sanely(spark):
    # review regression: a parcel straddling lon=180 must buffer in a
    # LOCAL tangent frame, not one centered near lon 0
    xs = [179.995, -179.995, -179.995, 179.995]
    ys = [10.0, 10.0, 10.01, 10.01]
    df = spark.createDataFrame(
        [(1, {"kind": 3, "xs": xs, "ys": ys, "ring_offsets": [0, 4],
              "bbox": {"minx": -179.995, "miny": 10.0, "maxx": 179.995,
                       "maxy": 10.01}})], GEOM_SCHEMA)
    g = buffer_polygons(df, radius=200.0, segments=16,
                        metric="geodesic", out_col="g").collect()[0]["g"]
    assert g is not None
    deg_m = math.pi / 180.0 * G.EARTH_RADIUS_M
    w = 0.01 * deg_m * math.cos(math.radians(10.005))
    h = 0.01 * deg_m
    r, s = 200.0, 16
    want = (w * h + 2 * (w + h) * r
            + 0.5 * s * r * r * math.sin(2 * math.pi / s))
    got = abs(G.rings_area(
        *G.lonlat_to_aeqd(np.array(g["xs"]), np.array(g["ys"]),
                          179.999, 10.005),
        np.array(g["ring_offsets"])))
    assert got == pytest.approx(want, rel=5e-3)
