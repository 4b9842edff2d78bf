"""Focal ops (operators/focal.py): Horn gradients are EXACT on linear
fields, so a planar ramp checks every interior pixel — including tile
seams, which is the halo-exchange proof — in closed form."""

import math

import numpy as np
import pytest

from spandex_spark.operators.focal import aspect, hillshade, slope

RES, NPX, NT = 0.5, 10, 3  # 3x3 tiles of 10x10 px


def _ramp_tiles(spark, a=3.0, b=4.0, res_y=None):
    """v = a*x + b*y sampled at pixel centers; origin (0, 0)."""
    ry = res_y if res_y is not None else RES
    rows = []
    for ty in range(NT):
        for tx in range(NT):
            x0, y0 = tx * NPX * RES, ty * NPX * ry
            px = x0 + (np.arange(NPX) + 0.5) * RES
            py = y0 + (np.arange(NPX) + 0.5) * ry
            lon, lat = np.meshgrid(px, py)
            v = a * lon + b * lat
            rows.append((ty * NT + tx, x0, y0, RES, ry, NPX, NPX,
                         v.ravel().tolist()))
    return spark.createDataFrame(
        rows, "tile_id long, x0 double, y0 double, res double, res_y double,"
              " nx int, ny int, values array<double>")


def _grid(rows):
    """collect() rows -> dict[(tx,ty)] -> 2D array (None -> NaN)."""
    out = {}
    for r in rows:
        key = (round(r["x0"] / (NPX * RES)), r["y0"])
        out[r["tile_id"]] = np.asarray(
            [np.nan if v is None else v for v in r["values"]],
            np.float64).reshape(r["ny"], r["nx"])
    return out


def test_slope_exact_on_ramp_including_seams(spark):
    got = slope(_ramp_tiles(spark), origin_x=0.0, origin_y=0.0).collect()
    assert len(got) == NT * NT
    want = math.degrees(math.atan(math.hypot(3.0, 4.0)))
    tiles = _grid(got)
    full = np.full((NT * NPX, NT * NPX), np.nan)
    for tid, arr in tiles.items():
        ty, tx = divmod(tid, NT)
        full[ty * NPX:(ty + 1) * NPX, tx * NPX:(tx + 1) * NPX] = arr
    inner = full[1:-1, 1:-1]
    assert np.allclose(inner, want, atol=1e-9)   # seams exact too
    # global raster border is NULL (incomplete window)
    assert np.all(np.isnan(full[0, :])) and np.all(np.isnan(full[-1, :]))
    assert np.all(np.isnan(full[:, 0])) and np.all(np.isnan(full[:, -1]))
    assert np.isnan(full).sum() == 4 * (NT * NPX) - 4


def test_aspect_and_flat(spark):
    got = _grid(aspect(_ramp_tiles(spark), origin_x=0.0,
                       origin_y=0.0).collect())
    want = math.degrees(math.atan2(-3.0, -4.0)) % 360.0  # downslope bearing
    center = got[4][3:7, 3:7]  # middle tile, well interior
    assert np.allclose(center, want, atol=1e-9)
    flat = _grid(aspect(_ramp_tiles(spark, a=0.0, b=0.0),
                        origin_x=0.0, origin_y=0.0).collect())
    assert np.all(np.isnan(flat[4]))  # flat => NULL everywhere


def test_hillshade_closed_form(spark):
    got = _grid(hillshade(_ramp_tiles(spark), origin_x=0.0, origin_y=0.0,
                          azimuth_deg=315.0, altitude_deg=45.0).collect())
    sl = math.atan(math.hypot(3.0, 4.0))
    asp = math.atan2(-3.0, -4.0)
    zen = math.radians(45.0)
    az = math.radians(315.0)
    want = round(255.0 * max(0.0, math.cos(zen) * math.cos(sl)
                             + math.sin(zen) * math.sin(sl)
                             * math.cos(az - asp)))
    assert np.all(got[4][2:8, 2:8] == want)
    # flat terrain shades to 255*cos(zenith), not NULL
    flat = _grid(hillshade(_ramp_tiles(spark, a=0.0, b=0.0),
                           origin_x=0.0, origin_y=0.0).collect())
    assert np.all(flat[4][2:8, 2:8] == round(255.0 * math.cos(zen)))


def test_anisotropic_res_y(spark):
    """res_y = 2*res: gradients are per MAP unit, so the ramp still
    comes out exact."""
    got = _grid(slope(_ramp_tiles(spark, res_y=1.0), origin_x=0.0,
                      origin_y=0.0).collect())
    want = math.degrees(math.atan(math.hypot(3.0, 4.0)))
    assert np.allclose(got[4][2:8, 2:8], want, atol=1e-9)


def test_scale_and_z_factor(spark):
    got = _grid(slope(_ramp_tiles(spark), origin_x=0.0, origin_y=0.0,
                      scale=100.0, z_factor=2.0).collect())
    want = math.degrees(math.atan(2.0 * math.hypot(3.0, 4.0) / 100.0))
    assert np.allclose(got[4][2:8, 2:8], want, atol=1e-9)


def test_null_pixel_poisons_window_only(spark):
    tiles = _ramp_tiles(spark)
    # null out one interior pixel of the middle tile
    import pyspark.sql.functions as F
    tiles = tiles.withColumn(
        "values",
        F.when(F.col("tile_id") == 4,
               F.transform("values", lambda v, i:
                           F.when(i == 55, F.lit(None)).otherwise(v)))
        .otherwise(F.col("values")))
    got = _grid(slope(tiles, origin_x=0.0, origin_y=0.0).collect())
    arr = got[4]
    r, c = divmod(55, NPX)
    hole = np.isnan(arr)
    assert hole[max(r - 1, 0):r + 2, max(c - 1, 0):c + 2].all()
    assert hole.sum() == 9  # tile 4 is interior: only the 3x3 around it
    want = math.degrees(math.atan(5.0))
    assert np.allclose(arr[~hole], want, atol=1e-9)


def test_irregular_tiling_rejected(spark):
    bad = spark.createDataFrame(
        [(0, 0.0, 0.0, 0.5, 0.5, 10, 10, [0.0] * 100),
         (1, 5.0, 0.0, 0.25, 0.25, 10, 10, [0.0] * 100)],
        "tile_id long, x0 double, y0 double, res double, res_y double,"
        " nx int, ny int, values array<double>")
    with pytest.raises(ValueError, match="regular tiling"):
        slope(bad, origin_x=0.0, origin_y=0.0)


def test_curvature_quadratic_closed_form(spark):
    """z = a·x² + b·y²: finite differences are EXACT on quadratics, so
    D=a, E=b, F=0, G=2ax, H=2by at every interior cell — check the
    Zevenbergen-Thorne outputs against those hand-derived values."""
    import numpy as np
    from spandex_spark.operators.focal import curvature
    a, b, res, n = 0.03, -0.02, 1.0, 16
    xs = (np.arange(n) + 0.5) * res
    ys = (np.arange(n) + 0.5) * res
    zz = a * xs[None, :] ** 2 + b * ys[:, None] ** 2
    tiles = spark.createDataFrame(
        [(0, 0.0, 0.0, res, n, n, [float(v) for v in zz.ravel()])],
        "tile_id long, x0 double, y0 double, res double, nx int, "
        "ny int, values array<double>")
    out = {}
    for kind in ("total", "profile", "plan"):
        r = curvature(tiles, origin_x=0.0, origin_y=0.0,
                      kind=kind).collect()[0]
        out[kind] = np.array([np.nan if v is None else v
                              for v in r["values"]]).reshape(n, n)
    # interior cell (row 5, col 9): x = 9.5, y = 5.5
    x, y = xs[9], ys[5]
    G, H = 2 * a * x, 2 * b * y
    g2 = G * G + H * H
    assert out["total"][5, 9] == pytest.approx(-2 * (a + b), rel=1e-9)
    assert out["plan"][5, 9] == pytest.approx(
        2 * (a * H * H + b * G * G) / g2, rel=1e-9)
    assert out["profile"][5, 9] == pytest.approx(
        -2 * (a * G * G + b * H * H) / g2, rel=1e-9)
    # borders NULL (incomplete window)
    assert np.isnan(out["total"][0]).all()
    # flat surface: plan/profile 0, total 0
    flat = spark.createDataFrame(
        [(0, 0.0, 0.0, res, n, n, [2.0] * (n * n))],
        "tile_id long, x0 double, y0 double, res double, nx int, "
        "ny int, values array<double>")
    fr = curvature(flat, origin_x=0.0, origin_y=0.0,
                   kind="plan").collect()[0]["values"]
    inner = np.array(fr, float).reshape(n, n)[1:-1, 1:-1]
    assert (inner == 0.0).all()
    with pytest.raises(ValueError):
        curvature(tiles, origin_x=0.0, origin_y=0.0, kind="bogus")
