"""Minimum bounding circle + oriented envelope (operators/bounds.py):
kernel closed forms, brute-force minimality, and the Spark operator
contracts (NULL degeneracy, inscribed n-gon, parcel fixtures)."""

import math

import numpy as np
import pytest

from spandex_spark import geom
from spandex_spark.operators.bounds import bounding_circle, oriented_envelope


# ---------- kernel: min_enclosing_circle ----------

def test_mec_square():
    cx, cy, r = geom.min_enclosing_circle(
        np.array([0, 1, 0, 1.0]), np.array([0, 0, 1, 1.0]))
    assert (cx, cy) == (0.5, 0.5)
    assert abs(r - math.sqrt(2) / 2) < 1e-12


def test_mec_obtuse_triangle_is_diameter():
    cx, cy, r = geom.min_enclosing_circle(
        np.array([0, 4, 1.0]), np.array([0, 0, 1.0]))
    assert (cx, cy, r) == (2.0, 0.0, 2.0)


def test_mec_cocircular():
    n, R = 40, 2.0
    xs = np.array([R * math.cos(2 * math.pi * i / n) for i in range(n)])
    ys = np.array([R * math.sin(2 * math.pi * i / n) for i in range(n)])
    cx, cy, r = geom.min_enclosing_circle(xs, ys)
    assert abs(cx) < 1e-9 and abs(cy) < 1e-9 and abs(r - R) < 1e-9


def test_mec_single_and_duplicate_points():
    assert geom.min_enclosing_circle(np.array([3.0]), np.array([4.0])) \
        == (3.0, 4.0, 0.0)
    assert geom.min_enclosing_circle(
        np.array([3.0, 3.0, 3.0]), np.array([4.0, 4.0, 4.0])) == (3.0, 4.0, 0.0)


def _brute_mec(pts):
    """Smallest of all pair-diameter and triple-circumcircle candidates
    that contain every point."""
    best = None
    n = len(pts)
    cands = []
    for i in range(n):
        for j in range(i + 1, n):
            c = (pts[i] + pts[j]) / 2
            cands.append((c, np.sum((pts[i] - c) ** 2)))
            for k in range(j + 1, n):
                a, b, cc = pts[i], pts[j], pts[k]
                d = 2 * (a[0] * (b[1] - cc[1]) + b[0] * (cc[1] - a[1])
                         + cc[0] * (a[1] - b[1]))
                if d == 0:
                    continue
                a2, b2, c2 = (a**2).sum(), (b**2).sum(), (cc**2).sum()
                ux = (a2*(b[1]-cc[1]) + b2*(cc[1]-a[1]) + c2*(a[1]-b[1])) / d
                uy = (a2*(cc[0]-b[0]) + b2*(a[0]-cc[0]) + c2*(b[0]-a[0])) / d
                ctr = np.array([ux, uy])
                cands.append((ctr, np.sum((a - ctr) ** 2)))
    for ctr, r2 in cands:
        if np.all(np.sum((pts - ctr) ** 2, axis=1) <= r2 * (1 + 1e-9)):
            if best is None or r2 < best[1]:
                best = (ctr, r2)
    return best[0], math.sqrt(best[1])


def test_mec_matches_bruteforce_random():
    rng = np.random.default_rng(11)
    for _ in range(5):
        pts = rng.uniform(-5, 5, (12, 2))
        cx, cy, r = geom.min_enclosing_circle(pts[:, 0], pts[:, 1])
        bc, br = _brute_mec(pts)
        assert abs(r - br) < 1e-9
        assert math.hypot(cx - bc[0], cy - bc[1]) < 1e-9
        # containment
        assert np.all(np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
                      <= r * (1 + 1e-12))


# ---------- kernel: oriented_envelope ----------

def test_envelope_axis_aligned_square():
    rx, ry, area = geom.oriented_envelope(
        np.array([0, 1, 0, 1.0]), np.array([0, 0, 1, 1.0]))
    assert abs(area - 1.0) < 1e-12
    assert geom.shoelace_area(rx, ry) > 0          # CCW


def test_envelope_recovers_rotated_rect():
    th = 0.7
    c, s = math.cos(th), math.sin(th)
    bx = np.array([0, 3, 3, 0, 1.5, 3, 1.5, 0.0])
    by = np.array([0, 0, 2, 2, 0, 1, 2, 1.0])
    rx, ry, area = geom.oriented_envelope(bx * c - by * s, bx * s + by * c)
    assert abs(area - 6.0) < 1e-9
    # beats the axis-aligned bbox
    bb = (np.ptp(bx * c - by * s)) * (np.ptp(bx * s + by * c))
    assert area < bb - 1e-6


def test_envelope_contains_and_is_minimal():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 10, (25, 2))
    rx, ry, area = geom.oriented_envelope(pts[:, 0], pts[:, 1])
    # every point inside the rect (project onto the rect's basis)
    ux, uy = rx[1] - rx[0], ry[1] - ry[0]
    ln = math.hypot(ux, uy); ux, uy = ux / ln, uy / ln
    s = (pts[:, 0] - rx[0]) * ux + (pts[:, 1] - ry[0]) * uy
    t = (pts[:, 0] - rx[0]) * -uy + (pts[:, 1] - ry[0]) * ux
    w = math.hypot(rx[1] - rx[0], ry[1] - ry[0])
    h = math.hypot(rx[3] - rx[0], ry[3] - ry[0])
    assert np.all((s >= -1e-9) & (s <= w + 1e-9))
    assert np.all((t >= -1e-9) & (t <= h + 1e-9))
    # minimality vs a dense rotation scan of axis-aligned boxes
    for th in np.linspace(0, math.pi / 2, 361):
        cth, sth = math.cos(th), math.sin(th)
        a = np.ptp(pts[:, 0] * cth + pts[:, 1] * sth) \
            * np.ptp(-pts[:, 0] * sth + pts[:, 1] * cth)
        assert area <= a + 1e-9


def test_envelope_degenerate_none():
    assert geom.oriented_envelope(np.array([0, 1, 2.0]),
                                  np.array([0, 1, 2.0])) is None


# ---------- Spark operators ----------

def _geom_rows(spark):
    from pyspark.sql import functions as F
    from spandex_spark.sources.grids import geom_struct
    df = spark.createDataFrame(
        [(0, 0.0, 0.0, 2.0, 1.0), (1, 5.0, 5.0, 6.0, 9.0)],
        "id long, x0 double, y0 double, x1 double, y1 double")
    return df.select("id", geom_struct(F.col("x0"), F.col("y0"),
                                       F.col("x1"), F.col("y1")).alias("geom"))


def test_bounding_circle_operator(spark):
    rows = {r["id"]: r["mbc"] for r in
            bounding_circle(_geom_rows(spark)).collect()}
    assert rows[0]["cx"] == 1.0 and rows[0]["cy"] == 0.5
    assert abs(rows[0]["radius"] - math.hypot(1, 0.5)) < 1e-12
    assert abs(rows[1]["radius"] - math.hypot(0.5, 2)) < 1e-12


def test_bounding_circle_ngon(spark):
    out = bounding_circle(_geom_rows(spark), segments=64).collect()
    for r in out:
        g = r["mbc_geom"]
        assert len(g["xs"]) == 64
        c = r["mbc"]
        d = [math.hypot(x - c["cx"], y - c["cy"])
             for x, y in zip(g["xs"], g["ys"])]
        assert all(abs(v - c["radius"]) < 1e-9 for v in d)   # inscribed
        area = geom.shoelace_area(np.asarray(g["xs"]), np.asarray(g["ys"]))
        assert 0 < area < math.pi * c["radius"] ** 2


def test_oriented_envelope_operator(spark):
    rows = {r["id"]: r for r in
            oriented_envelope(_geom_rows(spark)).collect()}
    assert abs(rows[0]["geom_env_area"] - 2.0) < 1e-9
    assert abs(rows[1]["geom_env_area"] - 4.0) < 1e-9
    assert len(rows[0]["geom_env"]["xs"]) == 4


def test_null_geometry_passthrough(spark):
    from pyspark.sql import functions as F
    df = _geom_rows(spark).withColumn(
        "geom", F.when(F.col("id") == 0, F.col("geom")))
    got = {r["id"]: (r["mbc"], ) for r in bounding_circle(df).collect()}
    assert got[1][0] is None and got[0][0] is not None
    env = {r["id"]: r["geom_env"] for r in oriented_envelope(df).collect()}
    assert env[1] is None and env[0] is not None
