"""Distributed region labeling (operators/regions.py::region_group):
tiling invariance (4-tile == 1-tile byte-identical), cross-seam blob
merging, 4-vs-8 connectivity on diagonals incl. the 4-tile corner,
by_value semantics, nodata passthrough."""

import numpy as np
import pytest

from spandex_spark.operators.regions import region_group

RES = 1.0


def _tiles(spark, arrays, npx):
    rows = []
    for (tx, ty), a in arrays.items():
        vals = [None if np.isnan(v) else float(v) for v in a.ravel()]
        rows.append((ty * 100 + tx, tx * npx * RES, ty * npx * RES,
                     RES, RES, npx, npx, vals))
    return spark.createDataFrame(
        rows, "tile_id long, x0 double, y0 double, res double, res_y double,"
              " nx int, ny int, values array<double>")


def _collect(df, npx):
    out = {}
    for r in df.collect():
        out[r["tile_id"]] = np.asarray(
            [np.nan if v is None else v for v in r["values"]],
            np.float64).reshape(npx, npx)
    return out


def _stitch(tiles, npx, nt):
    full = np.full((nt * npx, nt * npx), np.nan)
    for tid, arr in tiles.items():
        ty, tx = divmod(tid, 100)
        full[ty*npx:(ty+1)*npx, tx*npx:(tx+1)*npx] = arr
    return full


def test_single_tile_two_blobs(spark):
    a = np.full((4, 4), np.nan)
    a[0, 0:2] = 7.0          # blob A
    a[3, 2:4] = 7.0          # blob B, same value but disconnected
    got = _collect(region_group(_tiles(spark, {(0, 0): a}, 4),
                                origin_x=0, origin_y=0), 4)[0]
    assert got[0, 0] == got[0, 1]
    assert got[3, 2] == got[3, 3]
    assert got[0, 0] != got[3, 2]
    assert np.isnan(got[1, 1])


def test_tiling_invariance_byte_identical(spark):
    npx, rng = 5, np.random.default_rng(4)
    # random small-alphabet field: many regions, many seam merges
    big = rng.integers(0, 3, (2 * npx, 2 * npx)).astype(float)
    quads = {(tx, ty): big[ty*npx:(ty+1)*npx, tx*npx:(tx+1)*npx].copy()
             for tx in range(2) for ty in range(2)}
    tiled = _stitch(_collect(region_group(
        _tiles(spark, quads, npx), origin_x=0, origin_y=0), npx), npx, 2)
    single = _collect(region_group(
        _tiles(spark, {(0, 0): big}, 2 * npx), origin_x=0, origin_y=0),
        2 * npx)[0]
    assert np.array_equal(tiled, single, equal_nan=True)


def test_blob_across_seam_is_one_region(spark):
    npx = 3
    a = np.zeros((npx, npx))          # all value 0 -> all one region
    quads = {(tx, ty): a.copy() for tx in range(2) for ty in range(2)}
    got = _stitch(_collect(region_group(
        _tiles(spark, quads, npx), origin_x=0, origin_y=0), npx), npx, 2)
    assert np.unique(got).shape[0] == 1


def test_diagonal_connectivity_4_vs_8_at_tile_corner(spark):
    npx = 2
    # one pixel at the NE corner of tile (0,0) and one at the SW corner
    # of tile (1,1): they touch ONLY diagonally, exactly at the 4-tile
    # meeting point
    quads = {(tx, ty): np.full((npx, npx), np.nan)
             for tx in range(2) for ty in range(2)}
    quads[(0, 0)][-1, -1] = 5.0       # row -1 = north, col -1 = east
    quads[(1, 1)][0, 0] = 5.0
    got4 = _stitch(_collect(region_group(
        _tiles(spark, quads, npx), origin_x=0, origin_y=0,
        connectivity=4), npx), npx, 2)
    got8 = _stitch(_collect(region_group(
        _tiles(spark, quads, npx), origin_x=0, origin_y=0,
        connectivity=8), npx), npx, 2)
    v4 = got4[~np.isnan(got4)]
    v8 = got8[~np.isnan(got8)]
    assert np.unique(v4).shape[0] == 2        # separate under 4-conn
    assert np.unique(v8).shape[0] == 1        # merged under 8-conn


def test_by_value_false_merges_values(spark):
    npx = 3
    a = np.arange(9, dtype=float).reshape(3, 3)   # all distinct values
    got_v = _collect(region_group(_tiles(spark, {(0, 0): a}, npx),
                                  origin_x=0, origin_y=0,
                                  by_value=True), npx)[0]
    got_m = _collect(region_group(_tiles(spark, {(0, 0): a}, npx),
                                  origin_x=0, origin_y=0,
                                  by_value=False), npx)[0]
    assert np.unique(got_v).shape[0] == 9
    assert np.unique(got_m).shape[0] == 1


def test_labels_are_min_packed_pixel_ids(spark):
    npx = 3
    a = np.zeros((npx, npx))
    got = _collect(region_group(_tiles(spark, {(0, 0): a}, npx),
                                origin_x=0, origin_y=0), npx)[0]
    assert np.all(got == 0.0)    # min pixel (gx=0, gy=0) -> label 0
    with pytest.raises(ValueError):
        region_group(_tiles(spark, {(0, 0): a}, npx),
                     origin_x=0, origin_y=0, connectivity=6)
