"""Alpha shape (operators/voronoi.py::alpha_shape): cocircular exact
threshold, lattice-with-void hole orientation, disjoint clusters, and
agreement with the engine's even-odd region area."""

import math

import numpy as np

from spandex_spark import geom
from spandex_spark.operators.voronoi import alpha_shape


def _df(spark, pts, grp=0):
    return spark.createDataFrame(
        [(grp, float(x), float(y)) for x, y in pts],
        "grp long, lon double, lat double")


def _run(spark, pts, alpha):
    return alpha_shape(_df(spark, pts), group_col="grp",
                       alpha=alpha).collect()[0]


def _circle(n, r):
    return [(r * math.cos(2 * math.pi * i / n),
             r * math.sin(2 * math.pi * i / n)) for i in range(n)]


def test_cocircular_exact_threshold(spark):
    """Every triangle of cocircular points has circumradius exactly R:
    alpha < R -> empty shape; alpha > R -> the full inscribed n-gon."""
    n, r = 40, 2.0
    below = _run(spark, _circle(n, r), alpha=1.9)
    assert below["geom"] is None and below["area"] == 0.0
    assert below["n_triangles"] == 0
    above = _run(spark, _circle(n, r), alpha=2.1)
    want = (n / 2.0) * r * r * math.sin(2 * math.pi / n)
    assert abs(above["area"] - want) < 1e-9
    assert above["geom"]["kind"] == 3          # one outer ring
    assert len(above["geom"]["ring_offsets"]) == 2
    assert above["n_triangles"] == n - 2


def test_lattice_void_hole_ring(spark):
    """5x5 unit lattice minus the center point: the four half-cells
    around the void survive only on their outer halves, opening a
    CW diamond hole of area 2 inside the 4x4 outer square."""
    pts = [(i, j) for i in range(5) for j in range(5) if (i, j) != (2, 2)]
    row = _run(spark, pts, alpha=0.8)
    assert abs(row["area"] - 14.0) < 1e-9      # 16 - diamond(2)
    g = row["geom"]
    assert g["kind"] == 6 and len(g["ring_offsets"]) == 3
    xs, ys = np.asarray(g["xs"]), np.asarray(g["ys"])
    offs = list(g["ring_offsets"])
    signed = [geom.shoelace_area(xs[a:b], ys[a:b])
              for a, b in zip(offs, offs[1:])]
    signed.sort()
    assert abs(signed[0] + 2.0) < 1e-9         # CW hole, area -2
    assert abs(signed[1] - 16.0) < 1e-9        # CCW outer, area 16
    # the even-odd region kernel agrees with the triangle-sum area
    assert abs(geom.rings_area(xs, ys, offs) - row["area"]) < 1e-9


def test_disjoint_clusters_two_outer_rings(spark):
    """Two unit squares 100 units apart: one multi-part shape, both
    rings CCW, area exactly 2."""
    sq = [(0, 0), (1, 0), (0, 1), (1, 1)]
    pts = sq + [(x + 100, y) for x, y in sq]
    row = _run(spark, pts, alpha=0.8)
    assert abs(row["area"] - 2.0) < 1e-9
    g = row["geom"]
    assert g["kind"] == 6 and len(g["ring_offsets"]) == 3
    xs, ys = np.asarray(g["xs"]), np.asarray(g["ys"])
    offs = list(g["ring_offsets"])
    for a, b in zip(offs, offs[1:]):
        assert geom.shoelace_area(xs[a:b], ys[a:b]) > 0  # all outer/CCW


def test_alpha_infinite_equals_convex_hull_area(spark):
    """alpha=inf keeps every Delaunay triangle: the shape IS the convex
    hull, so the area matches the monotone-chain hull area."""
    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 10, (30, 2))
    row = _run(spark, [tuple(p) for p in pts], alpha=float("inf"))
    hx, hy = geom.convex_hull(pts[:, 0], pts[:, 1])
    assert abs(row["area"] - abs(geom.shoelace_area(hx, hy))) < 1e-9
