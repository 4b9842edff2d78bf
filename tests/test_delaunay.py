"""Delaunay edges (operators/voronoi.py::delaunay_edges): closed-form
counts, the exact Euler edge count 3n-3-h on random sets, and the
empty-circle property per reported edge."""

import numpy as np
import pytest

from spandex_spark.operators.voronoi import delaunay_edges


def _df(spark, pts):
    return spark.createDataFrame(
        [(0, i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "grp long, pid long, lon double, lat double")


def _edges(spark, pts):
    rows = delaunay_edges(_df(spark, pts), group_col="grp",
                          point_id_col="pid").collect()
    return {tuple(sorted((r["id_a"], r["id_b"]))) for r in rows}


def _hull_size(pts):
    """Andrew monotone chain; counts hull VERTICES (general position)."""
    p = sorted(map(tuple, pts))
    def half(seq):
        out = []
        for q in seq:
            while len(out) >= 2 and (
                (out[-1][0]-out[-2][0])*(q[1]-out[-2][1])
                - (out[-1][1]-out[-2][1])*(q[0]-out[-2][0])) <= 0:
                out.pop()
            out.append(q)
        return out
    lo, hi = half(p), half(reversed(p))
    return len(lo) + len(hi) - 2


def test_triangle(spark):
    assert _edges(spark, [(0, 0), (4, 0), (1, 3)]) == {(0, 1), (0, 2), (1, 2)}


def test_square_with_center(spark):
    pts = [(0, 0), (2, 0), (2, 2), (0, 2), (1, 1)]
    e = _edges(spark, pts)
    want = {(0, 1), (1, 2), (2, 3), (0, 3),
            (0, 4), (1, 4), (2, 4), (3, 4)}
    assert e == want  # sides + spokes, NO corner-to-corner diagonals


def test_random_euler_count_and_empty_circle(spark):
    """Seed 11 contains the regression pair (2,3): a Delaunay edge
    whose empty circle has radius ~128 — the case that killed the
    clipped-Voronoi-dual implementation."""
    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 10, (15, 2))
    e = _edges(spark, pts)
    n, h = 15, _hull_size(pts)
    assert (2, 3) in e  # the far-circumcenter regression edge
    assert len(e) == 3 * n - 3 - h  # exact for a triangulation
    # empty-circle property, exact: every reported edge belongs to
    # some triangle whose circumcircle is empty of all other sites
    P = np.asarray(pts)

    def has_empty_circumcircle(i, j):
        for k in range(n):
            if k in (i, j):
                continue
            a, b, c = P[i], P[j], P[k]
            d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                     + c[0] * (a[1] - b[1]))
            if abs(d) < 1e-14:
                continue
            ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1])
                  + (c @ c) * (a[1] - b[1])) / d
            uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0])
                  + (c @ c) * (b[0] - a[0])) / d
            r = np.hypot(a[0] - ux, a[1] - uy)
            dist = np.hypot(P[:, 0] - ux, P[:, 1] - uy)
            mask = np.ones(n, bool)
            mask[[i, j, k]] = False
            if (dist[mask] > r - 1e-9).all():
                return True
        return False

    for i, j in e:
        assert has_empty_circumcircle(i, j), (i, j)


def test_triangle_count_euler(spark):
    from spandex_spark.operators.voronoi import delaunay_triangles
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 10, (25, 2))
    tris = delaunay_triangles(_df(spark, pts), group_col="grp",
                              point_id_col="pid").collect()
    n, h = 25, _hull_size(pts)
    assert len(tris) == 2 * n - 2 - h
    # every triangle's circumcircle is empty (the Delaunay property)
    P = np.asarray(pts)
    for t in tris:
        a, b, c = P[t["id_a"]], P[t["id_b"]], P[t["id_c"]]
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                 + c[0] * (a[1] - b[1]))
        ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1])
              + (c @ c) * (a[1] - b[1])) / d
        uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0])
              + (c @ c) * (b[0] - a[0])) / d
        r = np.hypot(a[0] - ux, a[1] - uy)
        dist = np.hypot(P[:, 0] - ux, P[:, 1] - uy)
        mask = np.ones(n, bool)
        mask[[t["id_a"], t["id_b"], t["id_c"]]] = False
        assert (dist[mask] > r - 1e-9).all()
