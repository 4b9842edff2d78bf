"""IDW + kernel density (operators/interpolate.py): numpy brute-force
parity, exact-hit override, empty-cell conventions, density mass
conservation for interior points, JVM-only plan."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.interpolate import idw_grid, kernel_density_grid

GRID = dict(origin_x=0.0, origin_y=0.0, step=1.0, nx=8, ny=6)


def _centers():
    cx = GRID["origin_x"] + (np.arange(GRID["nx"]) + 0.5) * GRID["step"]
    cy = GRID["origin_y"] + (np.arange(GRID["ny"]) + 0.5) * GRID["step"]
    return cx, cy


@pytest.fixture(scope="module")
def cloud(spark):
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 8, 120)
    y = rng.uniform(0, 6, 120)
    v = rng.normal(50, 10, 120)
    df = spark.createDataFrame(
        [(float(x[i]), float(y[i]), float(v[i])) for i in range(120)],
        "lon double, lat double, v double")
    return df, x, y, v


def test_idw_matches_brute_force(spark, cloud):
    df, x, y, v = cloud
    radius, power = 2.0, 2.0
    rows = idw_grid(df, value_col="v", radius=radius, power=power,
                    **GRID).collect()
    cx, cy = _centers()
    for r in rows:
        d = np.sqrt((x - cx[r["gx"]]) ** 2 + (y - cy[r["gy"]]) ** 2)
        m = d <= radius
        assert r["n_neighbors"] == int(m.sum())
        if not m.any():
            assert r["value"] is None
        else:
            w = 1.0 / d[m] ** power
            assert r["value"] == pytest.approx(
                (v[m] * w).sum() / w.sum(), rel=1e-10)


def test_idw_exact_hit_takes_point_value(spark):
    df = spark.createDataFrame(
        [(2.5, 1.5, 100.0), (2.5, 1.5, 200.0), (3.0, 1.6, 7.0)],
        "lon double, lat double, v double")
    rows = {(r["gx"], r["gy"]): r for r in
            idw_grid(df, value_col="v", radius=2.0, **GRID).collect()}
    # cell (2,1) center is exactly (2.5, 1.5): mean of coincident values
    assert rows[(2, 1)]["value"] == pytest.approx(150.0)
    assert rows[(2, 1)]["n_neighbors"] == 3


def test_kde_matches_brute_force(spark, cloud):
    df, x, y, v = cloud
    h = 1.7
    rows = kernel_density_grid(df, bandwidth=h, weight_col="v",
                               **GRID).collect()
    cx, cy = _centers()
    for r in rows:
        d = np.sqrt((x - cx[r["gx"]]) ** 2 + (y - cy[r["gy"]]) ** 2)
        m = d < h
        ref = (v[m] * 3.0 / (math.pi * h * h)
               * (1 - (d[m] / h) ** 2) ** 2).sum()
        assert r["density"] == pytest.approx(ref, rel=1e-10, abs=1e-12)


def test_kde_unweighted_mass_conservation(spark):
    # one interior point: the kernel integrates to 1 over the plane;
    # a fine lattice Riemann sum must recover it
    df = spark.createDataFrame([(4.0, 3.0)], "lon double, lat double")
    step = 0.1
    rows = kernel_density_grid(
        df, origin_x=0.0, origin_y=0.0, step=step, nx=80, ny=60,
        bandwidth=1.5).collect()
    mass = sum(r["density"] for r in rows) * step * step
    assert mass == pytest.approx(1.0, abs=2e-3)
    # empty neighbourhoods are 0.0, never NULL
    assert all(r["density"] is not None for r in rows)


def test_plan_stays_jvm(spark, cloud):
    df, _, _, _ = cloud
    for frame in (idw_grid(df, value_col="v", radius=2.0, **GRID),
                  kernel_density_grid(df, bandwidth=1.0, **GRID)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan


def test_tin_reproduces_linear_field_exactly(spark):
    """TIN's defining property: barycentric interpolation over any
    triangulation reproduces a linear field z = a + b·x + c·y exactly
    inside the hull."""
    from spandex_spark.operators.interpolate import tin_grid
    rng = np.random.default_rng(17)
    a, b, c = 3.0, 0.7, -1.3
    x = np.concatenate([rng.uniform(0, 8, 40), [0, 8, 0, 8]])
    y = np.concatenate([rng.uniform(0, 6, 40), [0, 0, 6, 6]])
    z = a + b * x + c * y
    df = spark.createDataFrame(
        [(float(x[i]), float(y[i]), float(z[i])) for i in range(44)],
        "lon double, lat double, v double")
    rows = tin_grid(df, value_col="v", **GRID).collect()
    assert len(rows) == GRID["nx"] * GRID["ny"]
    for r in rows:
        want = a + b * r["cx"] + c * r["cy"]
        assert r["value"] == pytest.approx(want, rel=1e-9), \
            (r["gx"], r["gy"])


def test_tin_outside_hull_is_null(spark):
    from spandex_spark.operators.interpolate import tin_grid
    df = spark.createDataFrame(
        [(2.0, 2.0, 1.0), (6.0, 2.0, 2.0), (4.0, 5.0, 3.0)],
        "lon double, lat double, v double")
    rows = {(r["gx"], r["gy"]): r["value"]
            for r in tin_grid(df, value_col="v", **GRID).collect()}
    assert rows[(0, 0)] is None            # corner, outside triangle
    assert rows[(4, 2)] is not None        # near centroid, inside
    with pytest.raises(ValueError):
        tin_grid(df.limit(2), value_col="v", **GRID)
