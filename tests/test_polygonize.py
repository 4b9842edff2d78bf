"""Raster polygonize (operators/polygonize.py): closed-form regions,
holes, cross-tile seam cancellation, pixel counts, NaN nodata."""

import numpy as np
import pytest

from spandex_spark import geom as G
from spandex_spark.operators.polygonize import _trace_mask, polygonize

TILE_SCHEMA = ("tile_id long, x0 double, y0 double, res double,"
               " nx int, ny int, values array<double>")


def _tile(tid, x0, y0, res, vals2d):
    a = np.asarray(vals2d, np.float64)
    ny, nx = a.shape
    return (tid, float(x0), float(y0), float(res), nx, ny,
            a.ravel().tolist())


def _geom_area(g):
    return G.rings_area(np.array(g["xs"]), np.array(g["ys"]),
                        np.array(g["ring_offsets"]))


# ---------------------------------------------------------- kernel level

def test_trace_mask_square():
    m = np.zeros((4, 4), bool); m[1:3, 1:3] = True
    rings = _trace_mask(m)
    assert len(rings) == 1
    gx, gy = rings[0]
    assert gx.shape[0] == 4  # collinear mid-vertices dropped
    area = G.shoelace_area(gx.astype(float), gy.astype(float))
    assert area == 4.0  # CCW outer -> positive


def test_trace_mask_hole_orientation():
    m = np.ones((5, 5), bool); m[2, 2] = False
    rings = _trace_mask(m)
    assert len(rings) == 2
    areas = sorted(G.shoelace_area(gx.astype(float), gy.astype(float))
                   for gx, gy in rings)
    assert areas == [-1.0, 25.0]  # hole CW (negative), outer CCW


def test_trace_mask_disjoint_regions():
    m = np.zeros((3, 6), bool); m[0, 0] = True; m[2, 5] = True
    rings = _trace_mask(m)
    assert len(rings) == 2
    for gx, gy in rings:
        assert G.shoelace_area(gx.astype(float), gy.astype(float)) == 1.0


# ---------------------------------------------------------- spark level

def test_single_tile_values(spark):
    vals = [[0, 0, 1, 1],
            [0, 0, 1, 1],
            [2, 2, 1, 1],
            [2, 2, 1, 1]]
    df = spark.createDataFrame([_tile(0, 10.0, 20.0, 0.5, vals)],
                               TILE_SCHEMA)
    out = {r["value"]: r for r in polygonize(df).collect()}
    assert set(out) == {0.0, 1.0, 2.0}
    px_area = 0.5 * 0.5
    assert out[0.0]["n_pixels"] == 4
    assert _geom_area(out[0.0]["geom"]) == pytest.approx(4 * px_area)
    assert out[1.0]["n_pixels"] == 8
    assert _geom_area(out[1.0]["geom"]) == pytest.approx(8 * px_area)
    # value 0 sits at rows 0-1 (y0 side), cols 0-1
    bb = out[0.0]["geom"]["bbox"]
    assert (bb["minx"], bb["miny"]) == (10.0, 20.0)
    assert (bb["maxx"], bb["maxy"]) == (11.0, 21.0)


def test_cross_tile_seam_cancels(spark):
    # one value spanning two tiles side by side -> ONE merged region
    left = [[5, 5], [5, 5]]
    right = [[5, 5], [5, 5]]
    df = spark.createDataFrame(
        [_tile(0, 0.0, 0.0, 1.0, left), _tile(1, 2.0, 0.0, 1.0, right)],
        TILE_SCHEMA)
    [r] = polygonize(df).collect()
    assert r["value"] == 5.0 and r["n_pixels"] == 8
    g = r["geom"]
    assert len(g["ring_offsets"]) == 2  # single outer ring, no seam
    assert _geom_area(g) == pytest.approx(8.0)
    assert g["bbox"]["maxx"] == 4.0


def test_hole_through_spark(spark):
    vals = [[7, 7, 7],
            [7, 9, 7],
            [7, 7, 7]]
    df = spark.createDataFrame([_tile(0, 0.0, 0.0, 1.0, vals)],
                               TILE_SCHEMA)
    out = {r["value"]: r for r in polygonize(df).collect()}
    g7 = out[7.0]["geom"]
    assert len(g7["ring_offsets"]) == 3  # outer + hole
    assert _geom_area(g7) == pytest.approx(8.0)
    assert _geom_area(out[9.0]["geom"]) == pytest.approx(1.0)


def test_nan_is_nodata_and_min_pixels(spark):
    vals = [[1, np.nan], [np.nan, 2]]
    df = spark.createDataFrame([_tile(0, 0.0, 0.0, 1.0, vals)],
                               TILE_SCHEMA)
    out = polygonize(df).collect()
    assert {r["value"] for r in out} == {1.0, 2.0}
    out2 = polygonize(df, min_pixels=2).collect()
    assert out2 == []
