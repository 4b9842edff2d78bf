"""Rasterize (operators/rasterize.py): closed-form burn over the
fixture zone grid, polygonize round-trip, overlap/combine rules,
holes, and empty-tile contract."""

import os

import numpy as np
import pytest

from spandex_spark.operators.rasterize import rasterize


def _zones(spark, fixture_dir):
    return spark.read.parquet(os.path.join(fixture_dir, "zones.parquet"))


def _spec(spark, fixture_dir):
    return (spark.read.parquet(os.path.join(fixture_dir, "raster_tiles.parquet"))
            .drop("values"))


GEOM_SCHEMA = ("value double, geom struct<kind:tinyint, xs:array<double>,"
               " ys:array<double>, ring_offsets:array<int>,"
               " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def _poly(value, xs, ys, offsets=None):
    xs = [float(v) for v in xs]
    ys = [float(v) for v in ys]
    return (float(value),
            {"kind": 3, "xs": xs, "ys": ys,
             "ring_offsets": [int(v) for v in (offsets or [0, len(xs)])],
             "bbox": {"minx": min(xs), "miny": min(ys),
                      "maxx": max(xs), "maxy": max(ys)}})


def test_zone_grid_closed_form(spark, fixture_dir):
    """Every pixel center sits strictly inside one 1-deg zone square, so
    the burn equals the fixture's zone_id formula exactly."""
    out = rasterize(_zones(spark, fixture_dir), _spec(spark, fixture_dir),
                    value_col="zone_id").collect()
    assert len(out) == 64
    for r in out:
        nx, ny, res = r["nx"], r["ny"], r["res"]
        px = r["x0"] + (np.arange(nx) + 0.5) * res
        py = r["y0"] + (np.arange(ny) + 0.5) * r["res_y"]
        lon, lat = np.meshgrid(px, py)
        want = (np.floor(lat) + 10) * 20 + (np.floor(lon) + 10)
        got = np.asarray(r["values"], np.float64).reshape(ny, nx)
        assert np.array_equal(got, want), r["tile_id"]


def test_polygonize_round_trip(spark, fixture_dir):
    """polygonize(rasterize(zones)) recovers every zone with its exact
    pixel count (1 deg / 0.05 = 20x20 = 400 px)."""
    from spandex_spark.operators.polygonize import polygonize
    tiles = rasterize(_zones(spark, fixture_dir), _spec(spark, fixture_dir),
                      value_col="zone_id")
    regions = {int(r["value"]): r["n_pixels"] for r in polygonize(tiles).collect()}
    assert regions == {z: 400 for z in range(400)}


def test_overlap_combine(spark, fixture_dir):
    polys = spark.createDataFrame(
        [_poly(1, [0, 2, 2, 0, 0], [0, 0, 2, 2, 0]),
         _poly(5, [1, 3, 3, 1, 1], [0, 0, 2, 2, 0])], GEOM_SCHEMA)
    spec = spark.createDataFrame(
        [(0, 0.0, 0.0, 0.5, 6, 4)],
        "tile_id long, x0 double, y0 double, res double, nx int, ny int")
    for combine, overlap_val in (("max", 5.0), ("min", 1.0)):
        r = rasterize(polys, spec, combine=combine).collect()[0]
        v = np.asarray(r["values"]).reshape(4, 6)
        assert np.array_equal(v[:, 0:2], np.full((4, 2), 1.0))   # only poly1
        assert np.array_equal(v[:, 2:4],
                              np.full((4, 2), overlap_val))      # overlap
        assert np.array_equal(v[:, 4:6], np.full((4, 2), 5.0))   # only poly5


def test_hole_is_nodata(spark):
    donut = spark.createDataFrame(
        [_poly(7, [0, 4, 4, 0, 0, 1, 1, 3, 3, 1],
               [0, 0, 4, 4, 0, 1, 3, 3, 1, 1], [0, 5, 10])], GEOM_SCHEMA)
    spec = spark.createDataFrame(
        [(0, 0.0, 0.0, 1.0, 4, 4)],
        "tile_id long, x0 double, y0 double, res double, nx int, ny int")
    v = np.asarray(rasterize(donut, spec).collect()[0]["values"],
                   np.float64).reshape(4, 4)  # NULL elements read as NaN
    inner = np.zeros((4, 4), bool)
    inner[1:3, 1:3] = True
    assert np.all(v[~inner] == 7.0)
    assert np.all(np.isnan(v[inner]))


def test_empty_tile_contract(spark):
    poly = spark.createDataFrame(
        [_poly(1, [0, 1, 1, 0, 0], [0, 0, 1, 1, 0])], GEOM_SCHEMA)
    spec = spark.createDataFrame(
        [(0, 0.0, 0.0, 0.5, 2, 2), (1, 50.0, 50.0, 0.5, 2, 2)],
        "tile_id long, x0 double, y0 double, res double, nx int, ny int")
    rows = {r["tile_id"]: r for r in rasterize(poly, spec).collect()}
    assert set(rows) == {0, 1}
    assert all(v == 1.0 for v in rows[0]["values"])
    assert all(v is None for v in rows[1]["values"])  # NULL nodata convention
    assert [r["tile_id"] for r in
            rasterize(poly, spec, keep_empty=False).collect()] == [0]
    # custom nodata
    rows2 = {r["tile_id"]: r
             for r in rasterize(poly, spec, nodata=-9999.0).collect()}
    assert all(v == -9999.0 for v in rows2[1]["values"])


def test_zonal_stats_agrees_by_construction(spark, fixture_dir):
    """zonal_stats over rasterize(zones) counts exactly the burned
    pixels per zone (same center-in-polygon convention)."""
    from spandex_spark.operators.zonal import zonal_stats
    zones = _zones(spark, fixture_dir)
    tiles = rasterize(zones, _spec(spark, fixture_dir), value_col="zone_id")
    out = zonal_stats(tiles, zones).collect()
    assert len(out) == 400
    for r in out:
        assert r["px_count"] == 400
        assert r["px_min"] == r["px_max"] == float(r["zone_id"])


def test_bad_combine_rejected(spark, fixture_dir):
    with pytest.raises(ValueError, match="combine"):
        rasterize(_zones(spark, fixture_dir), _spec(spark, fixture_dir),
                  combine="sum")
