"""Maximum inscribed circle (operators/bounds.py::max_inscribed_circle,
polylabel): rectangle inradius, hole-aware donut, reflex L-shape,
degenerate NULLs, and the center-validity invariant (signed distance at
the returned center equals the returned radius)."""

import numpy as np
import pytest

from spandex_spark.geom import points_in_rings
from spandex_spark.operators.bounds import max_inscribed_circle

_SCHEMA = ("pid long, geom struct<kind:tinyint, xs:array<double>, "
           "ys:array<double>, ring_offsets:array<int>, "
           "bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def _g(parts, kind=3):
    xs = [float(x) for p in parts for x, _ in p]
    ys = [float(y) for p in parts for _, y in p]
    offs = [0]
    for p in parts:
        offs.append(offs[-1] + len(p))
    return {"kind": kind, "xs": xs, "ys": ys, "ring_offsets": offs,
            "bbox": {"minx": min(xs), "miny": min(ys),
                     "maxx": max(xs), "maxy": max(ys)}}


def _run(spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    out = max_inscribed_circle(df)
    return {r.pid: (None if r.mic is None else
                    (r.mic.cx, r.mic.cy, r.mic.radius))
            for r in out.collect()}


def _boundary_dist(qx, qy, parts):
    d = np.inf
    for ring in parts:
        rx = np.array([p[0] for p in ring], float)
        ry = np.array([p[1] for p in ring], float)
        n = len(ring)
        for i in range(n):
            j = (i + 1) % n
            ex, ey = rx[j] - rx[i], ry[j] - ry[i]
            ln2 = ex * ex + ey * ey
            t = 0.0 if ln2 == 0 else np.clip(
                ((qx - rx[i]) * ex + (qy - ry[i]) * ey) / ln2, 0, 1)
            d = min(d, float(np.hypot(qx - (rx[i] + t * ex),
                                      qy - (ry[i] + t * ey))))
    return d


def test_rectangle_inradius(spark):
    rect = [[(0, 0), (4, 0), (4, 2), (0, 2)]]
    cx, cy, r = _run(spark, [(1, _g(rect))])[1]
    assert r == pytest.approx(1.0, abs=5e-3)
    assert cy == pytest.approx(1.0, abs=5e-3)
    assert 1.0 - 5e-3 <= cx <= 3.0 + 5e-3      # plateau along the long axis
    assert _boundary_dist(cx, cy, rect) == pytest.approx(r, abs=1e-6)


def test_donut_respects_hole(spark):
    outer = [(0, 0), (8, 0), (8, 8), (0, 8)]
    hole = [(2, 2), (2, 6), (6, 6), (6, 2)]
    cx, cy, r = _run(spark, [(1, _g([outer, hole]))])[1]
    # without the hole the answer would be r=4 at the centroid; the true
    # inradius of a square ring sits at a CORNER of the ring: the circle
    # centered on the diagonal touching both outer edges and the hole
    # corner, c = (2-c)*sqrt(2) => r = 4 - 2*sqrt(2)
    import math
    assert r == pytest.approx(4.0 - 2.0 * math.sqrt(2.0), abs=2e-2)
    assert _boundary_dist(cx, cy, [outer, hole]) == pytest.approx(
        r, abs=1e-6)
    inside = points_in_rings(
        np.array([cx]), np.array([cy]),
        np.array([p[0] for ring in [outer, hole] for p in ring], float),
        np.array([p[1] for ring in [outer, hole] for p in ring], float),
        np.array([0, 4, 8]))[0]
    assert inside


def test_lshape(spark):
    L = [[(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)]]
    cx, cy, r = _run(spark, [(1, _g(L))])[1]
    # the arms are 2 wide but the big circle sits in the corner square,
    # touching left+bottom edges and the reflex vertex (2,2): center
    # (c,c) with c = (2-c)*sqrt(2) => r = 4 - 2*sqrt(2), same geometry
    # as the donut corner
    import math
    assert r == pytest.approx(4.0 - 2.0 * math.sqrt(2.0), abs=2e-2)
    assert cx == pytest.approx(r, abs=2e-2)
    assert cy == pytest.approx(r, abs=2e-2)
    assert _boundary_dist(cx, cy, L) == pytest.approx(r, abs=1e-6)


def test_degenerate_null(spark):
    got = _run(spark, [(1, _g([[(0, 0), (1, 0)]])),
                       (2, _g([[(0, 0), (1, 0), (2, 0), (3, 0)]]))])
    assert got[1] is None and got[2] is None
