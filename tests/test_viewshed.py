"""Sampling viewshed (operators/viewshed.py): flat-terrain full
visibility, single-wall occlusion closed form, off-raster NULLs,
per-observer rollup."""

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.viewshed import viewshed, viewshed_counts

TILE_SCHEMA = ("tile_id long, x0 double, y0 double, res double, "
               "nx int, ny int, values array<double>")


def _flat_tiles(spark, wall_col=None, wall_height=50.0):
    nx = ny = 40
    vals = [0.0] * (nx * ny)
    if wall_col is not None:
        for r in range(ny):
            vals[r * nx + wall_col] = wall_height
    return spark.createDataFrame(
        [(1, 0.0, 0.0, 1.0, nx, ny, vals)], TILE_SCHEMA)


def _obs(spark, x, y):
    return spark.createDataFrame([(1, float(x), float(y))],
                                 "obs_id long, lon double, lat double")


def test_flat_terrain_fully_visible(spark):
    out = viewshed(_obs(spark, 20.2, 20.3), _flat_tiles(spark),
                   observer_id_col="obs_id", origin_x=0.0, origin_y=0.0,
                   max_dist=10.0, step=1.0, n_rays=8,
                   observer_height=2.0).collect()
    assert len(out) == 8 * 10
    inr = [r for r in out if r["visible"] is not None]
    assert len(inr) == 8 * 10  # max_dist 10 from center stays on-raster
    assert all(r["visible"] for r in inr)


def test_wall_blocks_exactly_behind(spark):
    # wall column x in [25, 26), observer at x=20.2: east ray blocked
    # beyond s=5 (the wall sample itself IS visible), other rays clear
    tiles = _flat_tiles(spark, wall_col=25, wall_height=50.0)
    out = viewshed(_obs(spark, 20.2, 20.3), tiles,
                   observer_id_col="obs_id", origin_x=0.0, origin_y=0.0,
                   max_dist=10.0, step=1.0, n_rays=4,
                   observer_height=2.0)
    rows = {(r["ray"], r["s"]): r for r in out.collect()}
    for s in range(1, 11):
        east = rows[(0, s)]
        if s < 5:
            assert east["visible"] and east["elev"] == 0.0
        elif s == 5:
            assert east["visible"] and east["elev"] == 50.0  # wall face
        else:
            assert east["visible"] is False  # shadow of the wall
        for ray in (1, 2, 3):  # north, west, south unaffected
            assert rows[(ray, s)]["visible"]


def test_off_raster_null_and_not_occluding(spark):
    # observer 3 units from the west edge: the west ray leaves the
    # raster at s>3 -> visible NULL there, and the east ray is unaffected
    out = viewshed(_obs(spark, 3.2, 20.3), _flat_tiles(spark),
                   observer_id_col="obs_id", origin_x=0.0, origin_y=0.0,
                   max_dist=8.0, step=1.0, n_rays=4, observer_height=2.0)
    rows = {(r["ray"], r["s"]): r for r in out.collect()}
    for s in range(1, 9):
        west = rows[(2, s)]
        if s <= 3:
            assert west["visible"]
        else:
            assert west["visible"] is None and west["elev"] is None
        assert rows[(0, s)]["visible"]


def test_counts_rollup(spark):
    tiles = _flat_tiles(spark, wall_col=25, wall_height=50.0)
    out = viewshed_counts(
        _obs(spark, 20.2, 20.3), tiles, observer_id_col="obs_id",
        origin_x=0.0, origin_y=0.0, max_dist=10.0, step=1.0, n_rays=4,
        observer_height=2.0).collect()[0]
    assert out["n_samples"] == 40
    assert out["n_visible"] == 35  # 5 shadow samples on the east ray
    assert out["visible_fraction"] == pytest.approx(35 / 40)


def test_param_validation(spark):
    with pytest.raises(ValueError):
        viewshed(_obs(spark, 1, 1), _flat_tiles(spark),
                 observer_id_col="obs_id", origin_x=0.0, origin_y=0.0,
                 max_dist=0.5, step=1.0)


def test_off_raster_observer_all_null(spark):
    # review regression: unknown observer elevation must yield NULL
    # visibility, not blanket TRUE
    out = viewshed(_obs(spark, 100.0, 100.0), _flat_tiles(spark),
                   observer_id_col="obs_id", origin_x=0.0, origin_y=0.0,
                   max_dist=5.0, step=1.0, n_rays=4, observer_height=2.0)
    assert all(r["visible"] is None for r in out.collect())
