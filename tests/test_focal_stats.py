"""Focal statistics (operators/focal.py::focal_stats): mean on a linear
ramp is exact (symmetric window), 4-tile seams match one big tile at
window=5 (the halo>1 proof), partial-window borders, nodata ignore, and
the count/range/std closed forms."""

import numpy as np
import pytest

from spandex_spark.operators.focal import focal_stats

RES = 1.0


def _tiles(spark, arrays, npx, origin=(0.0, 0.0)):
    """arrays: dict[(tx, ty)] -> 2D (ny, nx) array (NaN -> NULL)."""
    rows = []
    for (tx, ty), a in arrays.items():
        vals = [None if np.isnan(v) else float(v) for v in a.ravel()]
        rows.append((ty * 100 + tx, origin[0] + tx * npx * RES,
                     origin[1] + ty * npx * RES, RES, RES, npx, npx, vals))
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


def _ramp(tx, ty, npx, a=2.0, b=5.0):
    x = (np.arange(npx) + 0.5 + tx * npx) * RES
    y = (np.arange(npx) + 0.5 + ty * npx) * RES
    lon, lat = np.meshgrid(x, y)
    return a * lon + b * lat


def test_mean_exact_on_ramp_interior(spark):
    npx = 8
    arrays = {(tx, ty): _ramp(tx, ty, npx)
              for tx in range(2) for ty in range(2)}
    got = _collect(focal_stats(_tiles(spark, arrays, npx), origin_x=0.0,
                               origin_y=0.0, stat="mean", window=3), npx)
    full = np.full((2 * npx, 2 * npx), np.nan)
    want = np.full_like(full, np.nan)
    for (tx, ty), a in arrays.items():
        full[ty*npx:(ty+1)*npx, tx*npx:(tx+1)*npx] = got[ty * 100 + tx]
        want[ty*npx:(ty+1)*npx, tx*npx:(tx+1)*npx] = a
    # symmetric window on a linear field: mean == center, interior exact
    assert np.allclose(full[1:-1, 1:-1], want[1:-1, 1:-1], atol=1e-9)
    # border is a PARTIAL window (ignored-NaN convention), not NULL
    assert not np.isnan(full).any()


def test_window5_seams_match_single_tile(spark):
    npx, rng = 6, np.random.default_rng(5)
    big = rng.uniform(0, 100, (2 * npx, 2 * npx))
    quads = {(tx, ty): big[ty*npx:(ty+1)*npx, tx*npx:(tx+1)*npx].copy()
             for tx in range(2) for ty in range(2)}
    tiled = _collect(focal_stats(_tiles(spark, quads, npx), origin_x=0.0,
                                 origin_y=0.0, stat="mean", window=5), npx)
    single = _collect(focal_stats(
        _tiles(spark, {(0, 0): big}, 2 * npx), origin_x=0.0,
        origin_y=0.0, stat="mean", window=5), 2 * npx)[0]
    stitched = np.full((2 * npx, 2 * npx), np.nan)
    for (tx, ty) in quads:
        stitched[ty*npx:(ty+1)*npx, tx*npx:(tx+1)*npx] = tiled[ty * 100 + tx]
    assert np.allclose(stitched, single, atol=1e-12, equal_nan=True)


def test_count_and_partial_border(spark):
    npx = 4
    a = np.zeros((npx, npx))
    got = _collect(focal_stats(_tiles(spark, {(0, 0): a}, npx),
                               origin_x=0.0, origin_y=0.0,
                               stat="count", window=3), npx)[0]
    # corners see 4 cells, edges 6, interior 9
    assert got[0, 0] == 4 and got[0, 1] == 6 and got[1, 1] == 9


def test_nodata_ignored_not_poisoning(spark):
    npx = 4
    a = np.arange(npx * npx, dtype=float).reshape(npx, npx)
    a[1, 1] = np.nan
    got = _collect(focal_stats(_tiles(spark, {(0, 0): a}, npx),
                               origin_x=0.0, origin_y=0.0,
                               stat="mean", window=3), npx)[0]
    w = a[0:3, 0:3].ravel()
    assert abs(got[1, 1] - np.nanmean(w)) < 1e-12   # center nodata still aggregates
    assert not np.isnan(got).any()


def test_range_std_median_closed_form(spark):
    npx = 3
    a = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], float)
    t = _tiles(spark, {(0, 0): a}, npx)
    rng_ = _collect(focal_stats(t, origin_x=0, origin_y=0,
                                stat="range", window=3), npx)[0]
    assert rng_[1, 1] == 8.0
    std = _collect(focal_stats(t, origin_x=0, origin_y=0,
                               stat="std", window=3), npx)[0]
    assert abs(std[1, 1] - np.std(a)) < 1e-12
    med = _collect(focal_stats(t, origin_x=0, origin_y=0,
                               stat="median", window=3), npx)[0]
    assert med[1, 1] == 5.0


def test_bad_args(spark):
    t = _tiles(spark, {(0, 0): np.zeros((4, 4))}, 4)
    with pytest.raises(ValueError):
        focal_stats(t, origin_x=0, origin_y=0, stat="mode")
    with pytest.raises(ValueError):
        focal_stats(t, origin_x=0, origin_y=0, window=4)
    with pytest.raises(ValueError):
        # halo 5 > tile dim 4
        focal_stats(t, origin_x=0, origin_y=0, window=11).collect()
