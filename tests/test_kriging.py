"""Ordinary kriging (operators/kriging.py): exact-interpolation and
unbiasedness properties, numpy reference cross-check, variogram
estimation on a planted model, deterministic fit."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.kriging import (
    empirical_variogram, fit_variogram, kriging_grid, variogram_value)


def _points(spark, rows):
    return spark.createDataFrame(
        [(i, float(x), float(y), float(v))
         for i, (x, y, v) in enumerate(rows)],
        "pid long, lon double, lat double, value double")


VG = {"model": "exponential", "nugget": 0.0, "psill": 1.0, "range": 2.0}


def _ref_krige(cx, cy, pts, vg, k=16):
    arr = sorted(pts, key=lambda p: (np.hypot(p[0] - cx, p[1] - cy),
                                     p[0], p[1]))[:k]
    px = np.array([p[0] for p in arr])
    py = np.array([p[1] for p in arr])
    v = np.array([p[2] for p in arr])
    n = len(v)
    h = np.hypot(px[:, None] - px[None, :], py[:, None] - py[None, :])
    A = np.zeros((n + 1, n + 1))
    A[:n, :n] = variogram_value(vg, h)
    A[:n, n] = A[n, :n] = 1.0
    rhs = np.zeros(n + 1)
    rhs[:n] = variogram_value(vg, np.hypot(px - cx, py - cy))
    rhs[n] = 1.0
    lam = np.linalg.solve(A, rhs)
    return float(lam[:n] @ v), float(lam[:n] @ rhs[:n] + lam[n])


RNG = np.random.default_rng(11)
PTS = [(float(x), float(y), float(np.sin(x) + 0.3 * y))
       for x, y in RNG.uniform(0.2, 3.8, size=(25, 2))]


def test_matches_numpy_reference(spark):
    out = kriging_grid(_points(spark, PTS), value_col="value",
                       variogram=VG, origin_x=0.0, origin_y=0.0,
                       step=1.0, nx=4, ny=4, radius=6.0,
                       max_neighbors=16)
    rows = {(r["gx"], r["gy"]): r for r in out.collect()}
    assert len(rows) == 16
    for (gx, gy), r in rows.items():
        want_p, want_v = _ref_krige(gx + 0.5, gy + 0.5, PTS, VG)
        assert r["pred"] == pytest.approx(want_p, abs=1e-9), (gx, gy)
        assert r["variance"] == pytest.approx(want_v, abs=1e-9)


def test_constant_field_is_exactly_reproduced(spark):
    pts = [(x, y, 7.25) for x, y, _ in PTS]
    out = kriging_grid(_points(spark, pts), value_col="value",
                       variogram=VG, origin_x=0.0, origin_y=0.0,
                       step=1.0, nx=4, ny=4, radius=6.0)
    for r in out.collect():
        assert r["pred"] == pytest.approx(7.25, abs=1e-8)  # weights sum to 1


def test_exact_interpolation_at_sample_with_zero_nugget(spark):
    # a sample sits exactly on a cell center: prediction == sample value
    pts = PTS + [(1.5, 2.5, 42.0)]
    out = kriging_grid(_points(spark, pts), value_col="value",
                       variogram=VG, origin_x=0.0, origin_y=0.0,
                       step=1.0, nx=4, ny=4, radius=6.0)
    r = {(q["gx"], q["gy"]): q for q in out.collect()}[(1, 2)]
    assert r["pred"] == pytest.approx(42.0, abs=1e-8)
    assert r["variance"] == pytest.approx(0.0, abs=1e-8)


def test_coincident_points_pre_averaged(spark):
    pts = PTS + [(0.7, 0.7, 10.0), (0.7, 0.7, 20.0)]  # duplicate site
    out = kriging_grid(_points(spark, pts), value_col="value",
                       variogram=VG, origin_x=0.0, origin_y=0.0,
                       step=1.0, nx=2, ny=2, radius=6.0)
    ref = [p for p in pts if p[:2] != (0.7, 0.7)] + [(0.7, 0.7, 15.0)]
    for r in out.collect():
        want_p, _ = _ref_krige(r["gx"] + 0.5, r["gy"] + 0.5, ref, VG)
        assert r["pred"] == pytest.approx(want_p, abs=1e-9)


def test_empty_radius_cells_null(spark):
    pts = [(0.5, 0.5, 1.0), (0.6, 0.5, 2.0), (0.5, 0.6, 3.0)]
    out = kriging_grid(_points(spark, pts), value_col="value",
                       variogram=VG, origin_x=0.0, origin_y=0.0,
                       step=1.0, nx=8, ny=1, radius=1.0)
    rows = {r["gx"]: r for r in out.collect()}
    assert rows[0]["pred"] is not None
    assert rows[7]["pred"] is None and rows[7]["variance"] is None


def test_variogram_recovers_planted_model(spark):
    # field drawn from a known exponential variogram via cholesky
    rng = np.random.default_rng(3)
    xy = rng.uniform(0, 10, size=(120, 2))
    h = np.hypot(xy[:, None, 0] - xy[None, :, 0],
                 xy[:, None, 1] - xy[None, :, 1])
    true = {"model": "exponential", "nugget": 0.1, "psill": 1.0,
            "range": 3.0}
    cov = (true["nugget"] + true["psill"]) - variogram_value(true, h)
    vals = np.linalg.cholesky(cov + 1e-9 * np.eye(len(xy))) @ \
        rng.standard_normal(len(xy))
    pts = [(float(x), float(y), float(v))
           for (x, y), v in zip(xy, vals)]
    emp = empirical_variogram(_points(spark, pts), value_col="value",
                              id_col="pid", max_dist=6.0, n_lags=12)
    rows = emp.collect()
    assert len(rows) == 12 and all(r["n_pairs"] > 0 for r in rows)
    fit = fit_variogram(emp)
    # one realization is noisy: demand the right order of magnitude
    assert 0.3 < fit["psill"] + fit["nugget"] < 3.0
    assert 0.5 < fit["range"] < 12.0
    # gamma rises with distance on this field (short vs long lags)
    g = [r["gamma"] for r in sorted(rows, key=lambda r: r["lag"])]
    assert np.mean(g[:3]) < np.mean(g[-3:])


def test_fit_is_deterministic_and_exact_on_model_curve(spark):
    # feed the fitter points ON a known curve: it must recover it ~exactly
    import pandas as pd
    hs = np.linspace(0.3, 8.0, 12)
    gs = variogram_value(VG, hs)
    emp = spark.createDataFrame(pd.DataFrame(
        {"lag": range(12), "mean_h": hs, "gamma": gs,
         "n_pairs": [100] * 12}))
    fit = fit_variogram(emp, n_range_grid=200)
    assert fit["nugget"] == pytest.approx(0.0, abs=1e-3)
    assert fit["psill"] == pytest.approx(1.0, abs=0.02)
    assert fit["range"] == pytest.approx(2.0, rel=0.05)
