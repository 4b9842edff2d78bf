"""Watershed labeling (operators/regions.py::watersheds): two opposing
ramps make exactly two basins split at the ridge (across tile seams);
tiling invariance; a bowl is one basin; NULL passthrough."""

import numpy as np
import pytest

from spandex_spark.operators.focal import flow_direction
from spandex_spark.operators.regions import watersheds

RES = 1.0


def _tiles(spark, f, npx, nt):
    rows = []
    for ty in range(nt):
        for tx in range(nt):
            x0, y0 = tx * npx * RES, ty * npx * RES
            px = x0 + (np.arange(npx) + 0.5) * RES
            py = y0 + (np.arange(npx) + 0.5) * RES
            lon, lat = np.meshgrid(px, py)
            rows.append((ty * 100 + tx, x0, y0, RES, RES, npx, npx,
                         f(lon, lat).ravel().tolist()))
    return spark.createDataFrame(
        rows, "tile_id long, x0 double, y0 double, res double, res_y double,"
              " nx int, ny int, values array<double>")


def _full(df, npx, nt):
    full = np.full((nt * npx, nt * npx), np.nan)
    for r in df.collect():
        ty, tx = divmod(r["tile_id"], 100)
        full[ty*npx:(ty+1)*npx, tx*npx:(tx+1)*npx] = np.asarray(
            [np.nan if v is None else v for v in r["values"]]
        ).reshape(npx, npx)
    return full


def test_two_basins_split_at_ridge(spark):
    npx, nt = 6, 2
    w = nt * npx * RES
    # a tent: ridge at lon = w/2; water flows E on the east side, W on
    # the west side -> exactly two basins among interior pixels
    tiles = _tiles(spark, lambda lon, lat: -np.abs(lon - w / 2), npx, nt)
    fd = flow_direction(tiles, origin_x=0, origin_y=0)
    ws = _full(watersheds(fd, origin_x=0, origin_y=0), npx, nt)
    inner = ws[1:-1, 1:-1]
    labs = np.unique(inner[~np.isnan(inner)])
    # D8 on a pure E-W tent has NO north-south connectivity: every
    # interior ROW forms one west basin + one east basin
    n_rows = nt * npx - 2
    assert labs.shape[0] == 2 * n_rows
    mid = nt * npx // 2
    for i in range(n_rows):
        assert np.unique(inner[i, :mid - 1]).shape[0] == 1   # west chain
        assert np.unique(inner[i, mid - 1:]).shape[0] == 1   # east chain
        assert inner[i, 0] != inner[i, -1]
    assert np.isnan(ws[0, :]).all()        # border NULL


def test_tiling_invariance(spark):
    npx, nt = 5, 2
    f = lambda lon, lat: np.sin(lon * 0.7) * 3 + np.cos(lat * 0.5) * 2
    fd_tiled = flow_direction(_tiles(spark, f, npx, nt),
                              origin_x=0, origin_y=0)
    fd_single = flow_direction(_tiles(spark, f, npx * nt, 1),
                               origin_x=0, origin_y=0)
    a = _full(watersheds(fd_tiled, origin_x=0, origin_y=0), npx, nt)
    b = _full(watersheds(fd_single, origin_x=0, origin_y=0), npx * nt, 1)
    assert np.array_equal(a, b, equal_nan=True)


def test_bowl_is_one_basin(spark):
    npx, nt = 5, 2
    c = 5.5    # a PIXEL CENTER: the bowl has one unique minimum sink
    tiles = _tiles(spark,
                   lambda lon, lat: (lon - c) ** 2 + (lat - c) ** 2,
                   npx, nt)
    fd = flow_direction(tiles, origin_x=0, origin_y=0)
    ws = _full(watersheds(fd, origin_x=0, origin_y=0), npx, nt)
    inner = ws[1:-1, 1:-1]
    assert np.unique(inner[~np.isnan(inner)]).shape[0] == 1
