"""Hex binning (operators/hexbin.py): nearest-center (Voronoi)
property, numpy cube-round parity, conservation, center math,
JVM-only plan."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.hexbin import hexbin

SQRT3 = math.sqrt(3.0)


def _np_hex(x, y, size):
    """Independent cube-round (HALF_UP like Spark's round())."""
    qf = (SQRT3 / 3.0 * x - y / 3.0) / size
    rf = (2.0 / 3.0 * y) / size
    xf, zf = qf, rf
    yf = -xf - zf

    def r_half_up(v):
        return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))

    rx, ry, rz = r_half_up(xf), r_half_up(yf), r_half_up(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    rx2 = np.where(fix_x, -ry - rz, rx)
    rz2 = np.where(fix_z, -rx - ry, rz)
    return rx2.astype(int), rz2.astype(int)


@pytest.fixture(scope="module")
def cloud(spark):
    rng = np.random.default_rng(21)
    x = rng.uniform(-30, 30, 4000)
    y = rng.uniform(-20, 20, 4000)
    w = rng.uniform(0, 2, 4000)
    df = spark.createDataFrame(
        [(i, float(x[i]), float(y[i]), float(w[i])) for i in range(4000)],
        "id long, lon double, lat double, w double")
    return df, x, y, w


def test_matches_numpy_cube_round(spark, cloud):
    df, x, y, _ = cloud
    size = 1.3
    got = {}
    qf = df.select("id", "lon", "lat")
    # recover per-point assignment by binning singleton frames is slow;
    # instead compare aggregate histograms
    q, r = _np_hex(x, y, size)
    want = {}
    for qi, ri in zip(q, r):
        want[(qi, ri)] = want.get((qi, ri), 0) + 1
    rows = hexbin(df, size=size).collect()
    got = {(row["q"], row["r"]): row["n"] for row in rows}
    assert got == want


def test_nearest_center_property(spark, cloud):
    df, x, y, _ = cloud
    size = 2.0
    rows = hexbin(df, size=size).collect()
    centers = np.array([[r["cx"], r["cy"]] for r in rows])
    q, r = _np_hex(x, y, size)
    own = {(row["q"], row["r"]): i for i, row in enumerate(rows)}
    pts = np.stack([x, y], axis=1)
    d = np.sqrt(((pts[:, None, :] - centers[None, :, :]) ** 2).sum(-1))
    nearest = d.argmin(1)
    for i in range(len(x)):
        mine = own[(q[i], r[i])]
        # assigned center is within a hair of the true nearest center
        assert d[i, mine] <= d[i, nearest[i]] + 1e-9


def test_conservation_and_weights(spark, cloud):
    df, _, _, w = cloud
    rows = hexbin(df, size=0.8, weight_col="w").collect()
    assert sum(r["n"] for r in rows) == 4000
    assert sum(r["wsum"] for r in rows) == pytest.approx(w.sum(), rel=1e-9)


def test_center_math(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    r = hexbin(df, size=5.0).collect()[0]
    assert (r["q"], r["r"]) == (0, 0)
    assert r["cx"] == 0.0 and r["cy"] == 0.0
    with pytest.raises(ValueError):
        hexbin(df, size=0.0)


def test_plan_stays_jvm(spark, cloud):
    df, _, _, _ = cloud
    plan = hexbin(df, size=1.0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
