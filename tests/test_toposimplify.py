"""Topology-preserving simplification (operators/toposimplify.py):
shared boundaries stay IDENTICAL between neighbors, junctions pin,
isolated rings simplify like simplify_ring, degenerates NULL."""

import numpy as np
import pytest

from spandex_spark import geom as G
from spandex_spark.operators.toposimplify import simplify_topology

GEOM = ("grp int, pid long, geom struct<kind:tinyint, xs:array<double>,"
        " ys:array<double>, ring_offsets:array<int>,"
        " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def _poly(pid, xs, ys, offsets=None, grp=1):
    xs = [float(v) for v in xs]
    ys = [float(v) for v in ys]
    offsets = offsets or [0, len(xs)]
    return (grp, pid, {"kind": 3, "xs": xs, "ys": ys,
                       "ring_offsets": [int(v) for v in offsets],
                       "bbox": {"minx": min(xs), "miny": min(ys),
                                "maxx": max(xs), "maxy": max(ys)}})


def _dense_edge(p0, p1, n, wiggle=0.0, seed=0):
    """n interior points along p0->p1, optionally wiggled off-chord."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, n + 2)[1:-1]
    xs = p0[0] + t * (p1[0] - p0[0])
    ys = p0[1] + t * (p1[1] - p0[1])
    if wiggle:
        nx, ny = -(p1[1] - p0[1]), p1[0] - p0[0]
        ln = np.hypot(nx, ny)
        off = rng.uniform(-wiggle, wiggle, n)
        xs = xs + off * nx / ln
        ys = ys + off * ny / ln
    return list(zip(xs, ys))


def _ring(pts):
    return [p[0] for p in pts], [p[1] for p in pts]


def test_shared_boundary_identical_no_slivers(spark):
    # two unit squares side by side; the shared edge x=1 is densified
    # with sub-tolerance wiggle; each square's OUTER edges densified too
    shared = _dense_edge((1, 0), (1, 1), 15, wiggle=0.004, seed=3)
    left_pts = ([(0, 0), (1, 0)] + shared + [(1, 1), (0, 1)])
    right_pts = ([(1, 0), (2, 0), (2, 1), (1, 1)]
                 + list(reversed(shared)))
    lx, ly = _ring(left_pts)
    rx, ry = _ring(right_pts)
    df = spark.createDataFrame([_poly(1, lx, ly), _poly(2, rx, ry)], GEOM)
    out = {r["pid"]: r["geom"] for r in
           simplify_topology(df, tolerance=0.01, group_cols=("grp",),
                             id_col="pid").collect()}
    ga, gb = out[1], out[2]
    # the wiggled shared edge collapsed to its chord in BOTH polygons
    a = set(zip(ga["xs"], ga["ys"]))
    b = set(zip(gb["xs"], gb["ys"]))
    assert (1.0, 0.0) in a and (1.0, 1.0) in a
    # no interior shared-edge vertex survives in either
    assert not any(abs(x - 1.0) < 0.02 and 0.01 < y < 0.99
                   for x, y in a | b)
    # areas: each square back to ~1, and the union (sum) to ~2 — the
    # no-sliver guarantee (shared chain identical on both sides)
    area = lambda g: abs(G.rings_area(np.array(g["xs"]), np.array(g["ys"]),
                                      np.array(g["ring_offsets"])))
    assert area(ga) == pytest.approx(1.0, abs=0.02)
    assert area(gb) == pytest.approx(1.0, abs=0.02)
    shared_a = sorted(p for p in a if abs(p[0] - 1.0) < 1e-9)
    shared_b = sorted(p for p in b if abs(p[0] - 1.0) < 1e-9)
    assert shared_a == shared_b  # byte-identical shared chain


def test_junction_vertices_never_move(spark):
    # three boxes in a row: the 4 junction corners at x=1 and x=2 must
    # survive any tolerance (arc endpoints are pinned)
    boxes = [(0, 1), (1, 2), (2, 3)]
    rows = []
    for i, (x0, x1) in enumerate(boxes):
        pts = ([(x0, 0)] + _dense_edge((x0, 0), (x1, 0), 6)
               + [(x1, 0)] + _dense_edge((x1, 0), (x1, 1), 6)
               + [(x1, 1)] + _dense_edge((x1, 1), (x0, 1), 6)
               + [(x0, 1)] + _dense_edge((x0, 1), (x0, 0), 6))
        xs, ys = _ring(pts)
        rows.append(_poly(i, xs, ys))
    df = spark.createDataFrame(rows, GEOM)
    out = {r["pid"]: r["geom"] for r in
           simplify_topology(df, tolerance=0.5, group_cols=("grp",),
                             id_col="pid").collect()}
    for i, (x0, x1) in enumerate(boxes):
        pts = set(zip(out[i]["xs"], out[i]["ys"]))
        # junction corners pinned; real corners survive tol=0.5 (their
        # chord deviation is 1); every densified straight edge collapsed
        assert pts == {(float(x0), 0.0), (float(x1), 0.0),
                       (float(x1), 1.0), (float(x0), 1.0)}, (i, pts)


def test_isolated_ring_and_identity_tolerance(spark):
    pts = [(0, 0)] + _dense_edge((0, 0), (4, 0), 10) + \
        [(4, 0), (4, 4), (0, 4)]
    xs, ys = _ring(pts)
    df = spark.createDataFrame([_poly(1, xs, ys)], GEOM)
    g = simplify_topology(df, tolerance=0.01, group_cols=("grp",),
                          id_col="pid").collect()[0]["geom"]
    assert len(g["xs"]) == 4  # densified edge collapsed, corners kept
    g0 = simplify_topology(df, tolerance=0.0, group_cols=("grp",),
                           id_col="pid").collect()[0]["geom"]
    assert len(g0["xs"]) == len(xs)  # tol 0 = identity


def test_hole_rings_simplify_too(spark):
    outer = _ring([(0, 0), (6, 0), (6, 6), (0, 6)])
    hole_pts = [(2, 2)] + _dense_edge((2, 2), (4, 2), 8) + \
        [(4, 2), (4, 4), (2, 4)]
    hx, hy = _ring(hole_pts)
    xs = list(outer[0]) + hx
    ys = list(outer[1]) + hy
    df = spark.createDataFrame(
        [_poly(1, xs, ys, offsets=[0, 4, 4 + len(hx)])], GEOM)
    g = simplify_topology(df, tolerance=0.01, group_cols=("grp",),
                          id_col="pid").collect()[0]["geom"]
    assert len(g["ring_offsets"]) == 3
    assert len(g["xs"]) == 8  # both rings down to their 4 corners


def test_collapse_to_null(spark):
    # a degenerate 2-vertex "ring" survives nothing
    df = spark.createDataFrame([_poly(1, [0, 1], [0, 0])], GEOM)
    out = simplify_topology(df, tolerance=0.5, group_cols=("grp",),
                            id_col="pid").collect()
    assert out[0]["geom"] is None
