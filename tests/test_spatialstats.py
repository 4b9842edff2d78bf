"""Spatial autocorrelation (operators/spatialstats.py): numpy
brute-force parity for Moran's I / LISA / Gi*, plus closed-form sign
checks (checkerboard anti-correlates, split-plane correlates) and the
degenerate-input NULL contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.spatialstats import (
    morans_i, local_morans_i, getis_ord_gi_star)


def _grid_points(spark, vals):
    """Unit-lattice points (id = row-major index) valued by `vals`
    (2-D array), planar degrees."""
    h, w = vals.shape
    rows = [(int(r * w + c), float(c), float(r), float(vals[r, c]))
            for r in range(h) for c in range(w)]
    return spark.createDataFrame(rows, "id long, lon double, lat double, "
                                       "x double")


def _brute(vals, radius):
    """Brute-force Moran battery on the unit lattice, planar metric."""
    h, w = vals.shape
    xy = np.array([(c, r) for r in range(h) for c in range(w)], float)
    x = vals.ravel().astype(float)
    n = x.size
    d = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    wgt = (d <= radius) & ~np.eye(n, dtype=bool)
    z = x - x.mean()
    s0 = wgt.sum()
    i_stat = n / s0 * (wgt * np.outer(z, z)).sum() / (z * z).sum()
    e_i = -1.0 / (n - 1)
    s1, s2 = 2.0 * s0, (4.0 * wgt.sum(1) ** 2).sum()
    var = ((n * n * s1 - n * s2 + 3 * s0 * s0)
           / ((n * n - 1.0) * s0 * s0) - e_i * e_i)
    m2 = (z * z).sum() / n
    lisa = z / m2 * (wgt * z[None, :]).sum(1)
    wstar = wgt | np.eye(n, dtype=bool)
    s = np.sqrt((x * x).sum() / n - x.mean() ** 2)
    wi = wstar.sum(1).astype(float)
    gi = ((wstar * x[None, :]).sum(1) - x.mean() * wi) \
        / (s * np.sqrt((n * wi - wi * wi) / (n - 1.0)))
    return dict(i=i_stat, e=e_i, var=var, lisa=lisa, gi=gi)


@pytest.fixture(scope="module")
def random_field(spark):
    rng = np.random.default_rng(7)
    vals = rng.normal(10.0, 3.0, size=(6, 7))
    return _grid_points(spark, vals), vals


def test_morans_i_matches_brute_force(spark, random_field):
    df, vals = random_field
    got = morans_i(df, radius=1.5, value_col="x", id_col="id").collect()[0]
    ref = _brute(vals, 1.5)
    assert got["n"] == vals.size
    assert got["morans_i"] == pytest.approx(ref["i"], rel=1e-12)
    assert got["expected_i"] == pytest.approx(ref["e"], rel=1e-12)
    assert got["variance"] == pytest.approx(ref["var"], rel=1e-12)
    assert got["z_score"] == pytest.approx(
        (ref["i"] - ref["e"]) / np.sqrt(ref["var"]), rel=1e-12)


def test_lisa_matches_brute_force(spark, random_field):
    df, vals = random_field
    rows = local_morans_i(df, radius=1.5, value_col="x",
                          id_col="id").collect()
    ref = _brute(vals, 1.5)["lisa"]
    got = {r["id"]: r["lisa_i"] for r in rows}
    for i in range(vals.size):
        assert got[i] == pytest.approx(ref[i], rel=1e-10, abs=1e-12)


def test_gi_star_matches_brute_force(spark, random_field):
    df, vals = random_field
    rows = getis_ord_gi_star(df, radius=1.5, value_col="x",
                             id_col="id").collect()
    ref = _brute(vals, 1.5)["gi"]
    got = {r["id"]: r["gi_star"] for r in rows}
    for i in range(vals.size):
        assert got[i] == pytest.approx(ref[i], rel=1e-10, abs=1e-12)


def test_checkerboard_is_negative_split_is_positive(spark):
    idx = np.indices((6, 6)).sum(0)
    checker = np.where(idx % 2 == 0, 1.0, -1.0)
    split = np.where(np.indices((6, 6))[1] < 3, 1.0, -1.0)
    i_chk = morans_i(_grid_points(spark, checker), radius=1.1,
                     value_col="x", id_col="id").collect()[0]
    i_spl = morans_i(_grid_points(spark, split), radius=1.1,
                     value_col="x", id_col="id").collect()[0]
    # rook weights on a checkerboard: every neighbor disagrees -> I = -1
    assert i_chk["morans_i"] == pytest.approx(-1.0)
    assert i_chk["z_score"] < -3
    assert i_spl["morans_i"] > 0.5 and i_spl["z_score"] > 3


def test_constant_surface_nulls_the_statistic(spark):
    df = _grid_points(spark, np.full((4, 4), 2.5))
    row = morans_i(df, radius=1.1, value_col="x", id_col="id").collect()[0]
    assert row["morans_i"] is None and row["z_score"] is None
    # LISA likewise undefined (m2 = 0)
    rows = local_morans_i(df, radius=1.1, value_col="x",
                          id_col="id").collect()
    assert all(r["lisa_i"] is None for r in rows)
    # Gi* undefined when S = 0 too
    grows = getis_ord_gi_star(df, radius=1.1, value_col="x",
                              id_col="id").collect()
    assert all(r["gi_star"] is None for r in grows)


def test_no_neighbors_s0_zero(spark):
    # radius smaller than any gap: S0 = 0 -> global NULL, LISA lag 0
    df = _grid_points(spark, np.arange(9.0).reshape(3, 3))
    row = morans_i(df, radius=0.5, value_col="x", id_col="id").collect()[0]
    assert row["s0"] == 0 and row["morans_i"] is None
    rows = local_morans_i(df, radius=0.5, value_col="x",
                          id_col="id").collect()
    assert all(r["n_neighbors"] == 0 and r["lisa_i"] == 0.0 for r in rows)
    # Gi* star: W_i = 1 (self) still yields a finite score
    grows = getis_ord_gi_star(df, radius=0.5, value_col="x",
                              id_col="id").collect()
    assert all(r["n_neighbors"] == 1 and r["gi_star"] is not None
               for r in grows)


def test_hotspot_detected_on_planted_peak(spark):
    vals = np.zeros((8, 8))
    vals[3:5, 3:5] = 10.0          # a 2x2 hot block in a flat field
    rows = getis_ord_gi_star(_grid_points(spark, vals), radius=1.5,
                             value_col="x", id_col="id").collect()
    hot = {r["id"] for r in rows if r["gi_star"] is not None
           and r["gi_star"] > 2.0}
    planted = {r * 8 + c for r in (3, 4) for c in (3, 4)}
    assert planted <= hot
    # far corners are not hot
    assert 0 not in hot and 63 not in hot


def test_quadrants_on_split_plane(spark):
    split = np.where(np.indices((4, 4))[1] < 2, 5.0, -5.0)
    rows = local_morans_i(_grid_points(spark, split), radius=1.1,
                          value_col="x", id_col="id").collect()
    by_id = {r["id"]: r for r in rows}
    assert by_id[0]["quadrant"] == "HH"        # left edge, high among high
    assert by_id[3]["quadrant"] == "LL"        # right edge, low among low
    # boundary columns mix: high value, negative-leaning lag -> HL/HH only
    assert all(by_id[i]["quadrant"] in ("HH", "HL", "LL", "LH")
               for i in by_id)


def test_plan_stays_jvm(spark, random_field):
    df, _ = random_field
    plan = morans_i(df, radius=1.5, value_col="x", id_col="id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
