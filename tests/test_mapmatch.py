"""Map matching (operators/mapmatch.py): the HMM-beats-nearest test
(outlier stays on its road), clean matching, gap handling, endpoint
clamping, determinism."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import Row

from spandex_spark.geom import EARTH_RADIUS_M
from spandex_spark.operators.mapmatch import map_match

_DEG_M = EARTH_RADIUS_M * math.pi / 180.0


def _road(rid, pts):
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return Row(road_id=rid,
               geom={"kind": 2, "xs": xs, "ys": ys,
                     "ring_offsets": [0, len(xs)],
                     "bbox": {"minx": min(xs), "miny": min(ys),
                              "maxx": max(xs), "maxy": max(ys)}})


@pytest.fixture(scope="module")
def roads(spark):
    # two parallel east-west roads at the equator, ~66 m apart
    schema = ("road_id long, geom struct<kind:tinyint, xs:array<double>,"
              " ys:array<double>, ring_offsets:array<int>,"
              " bbox:struct<minx:double,miny:double,maxx:double,"
              "maxy:double>>")
    return spark.createDataFrame(
        [_road(1, [(0.0, 0.0), (0.01, 0.0)]),
         _road(2, [(0.0, 0.0006), (0.01, 0.0006)])], schema)


def _track(spark, pts, gid=7):
    t0 = dt.datetime(2026, 4, 1, 8, 0, 0)
    rows = [(gid, t0 + dt.timedelta(seconds=10 * i), float(x), float(y))
            for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(
        rows, "trip long, ts timestamp, lon double, lat double")


def test_hmm_keeps_outlier_on_road(spark, roads):
    # along road 1 with tiny noise, ONE point drifts nearer road 2
    pts = [(0.0002 * i, 2e-5) for i in range(10)]
    pts[5] = (0.0010, 0.00032)        # ~36 m from road1, ~31 m from road2
    out = map_match(_track(spark, pts), roads, group_col="trip",
                    road_id_col="road_id").collect()
    assert all(r["road_id"] == 1 for r in out), \
        [(r["ts"], r["road_id"]) for r in out]
    # ...whereas the per-point nearest road for the outlier IS road 2
    d1 = 0.00032 * _DEG_M
    d2 = (0.0006 - 0.00032) * _DEG_M
    assert d2 < d1


def test_clean_track_matches_its_road(spark, roads):
    pts = [(0.0003 * i, 0.0006 + (1 if i % 2 else -1) * 1e-5)
           for i in range(8)]
    out = map_match(_track(spark, pts), roads, group_col="trip",
                    road_id_col="road_id").collect()
    assert all(r["road_id"] == 2 for r in out)
    for r in out:
        assert r["snap_lat"] == pytest.approx(0.0006, abs=1e-12)
        assert r["dist_m"] == pytest.approx(1e-5 * _DEG_M, rel=1e-6)


def test_gap_breaks_chain(spark, roads):
    pts = [(0.0002, 1e-5), (0.0004, 1e-5),
           (0.5, 0.5),                       # nowhere near a road
           (0.0008, 1e-5)]
    out = sorted(map_match(_track(spark, pts), roads, group_col="trip",
                           road_id_col="road_id").collect(),
                 key=lambda r: r["ts"])
    assert [r["road_id"] for r in out] == [1, 1, None, 1]
    assert out[2]["snap_lon"] is None or np.isnan(out[2]["snap_lon"])


def test_endpoint_clamp(spark, roads):
    # point beyond the western end of road 1 snaps to the endpoint
    out = map_match(_track(spark, [(-0.001, 0.0001)]), roads,
                    group_col="trip", road_id_col="road_id").collect()[0]
    assert out["road_id"] == 1
    assert out["snap_lon"] == pytest.approx(0.0, abs=1e-15)
    want = math.hypot(0.001 * _DEG_M, 0.0001 * _DEG_M)
    assert out["dist_m"] == pytest.approx(want, rel=1e-6)


def test_partitioning_determinism(spark, roads):
    rng = np.random.default_rng(3)
    pts = [(0.0002 * i, float(rng.normal(0, 8e-5))) for i in range(40)]
    df = _track(spark, pts)
    a = sorted((r["ts"], r["road_id"]) for r in
               map_match(df.repartition(9), roads, group_col="trip",
                         road_id_col="road_id").collect())
    b = sorted((r["ts"], r["road_id"]) for r in
               map_match(df.coalesce(1), roads, group_col="trip",
                         road_id_col="road_id").collect())
    assert a == b
