"""Polygon erosion / negative buffer (operators/buffer.py::
erode_polygons): exact closed forms (rectangle, donut), full-erosion
NULL, the distance-transform oracle on the L-shape, multipart, and
guard rails."""

import math

import numpy as np
import pytest

from spandex_spark.geom import points_in_rings, shoelace_area
from spandex_spark.operators.buffer import erode_polygons

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


def _signed_area_sum(geom):
    offs = geom["ring_offsets"]
    xs, ys = np.asarray(geom["xs"]), np.asarray(geom["ys"])
    return sum(shoelace_area(xs[a:b], ys[a:b])
               for a, b in zip(offs[:-1], offs[1:]))


def _run(spark, rows, radius, segments=16):
    df = spark.createDataFrame(rows, _SCHEMA)
    out = erode_polygons(df, radius=radius, segments=segments)
    return {r.pid: (r.geom_eroded.asDict(recursive=True)
                    if r.geom_eroded is not None else None)
            for r in out.collect()}


def test_rectangle_exact(spark):
    rect = _g([[(0, 0), (4, 0), (4, 2), (0, 2)]])
    got = _run(spark, [(1, rect)], 0.5)[1]
    assert got is not None and len(got["ring_offsets"]) == 2
    xs, ys = got["xs"], got["ys"]
    assert set(zip(xs, ys)) == {(0.5, 0.5), (3.5, 0.5), (3.5, 1.5),
                                (0.5, 1.5)}
    assert abs(_signed_area_sum(got) - 3.0) < 1e-9


def test_donut_exact_two_rings(spark):
    outer = [(0, 0), (8, 0), (8, 8), (0, 8)]
    hole = [(2, 2), (2, 6), (6, 6), (6, 2)]        # CW hole
    donut = _g([outer, hole], kind=3)
    r, s = 0.5, 16
    got = _run(spark, [(1, donut)], r, segments=s)[1]
    assert got is not None and len(got["ring_offsets"]) == 3
    # outer erodes to the exact 7x7; the hole DILATES to a rounded
    # square (perimeter strips + 4 quarter inscribed-s-gon corner fans):
    # area = 49 - (16 + 16r + (s/2) r^2 sin(2pi/s)) exactly
    expect = 49.0 - (16.0 + 16.0 * r
                     + (s / 2.0) * r * r * math.sin(2.0 * math.pi / s))
    assert abs(abs(_signed_area_sum(got)) - expect) < 1e-9
    assert got["bbox"]["minx"] == pytest.approx(0.5)
    assert got["bbox"]["maxx"] == pytest.approx(7.5)


def test_full_erosion_null_and_degenerate_null(spark):
    small = _g([[(0, 0), (1, 0), (1, 1), (0, 1)]])
    degen = _g([[(0, 0), (1, 0)]])
    got = _run(spark, [(1, small), (2, degen)], 0.6)
    assert got[1] is None and got[2] is None


def test_lshape_distance_oracle(spark):
    # L-shape: 4x4 square minus its top-right 2x2 quadrant (reflex at
    # (2,2)); erosion by r must equal {p in P : dist(p, boundary) > r}
    # except within the inscribed-polygon sag band near the reflex arc
    L = [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)]
    r, segs = 0.5, 32
    got = _run(spark, [(1, _g([L]))], r, segments=segs)[1]
    assert got is not None
    rng = np.random.default_rng(5)
    px = rng.uniform(-0.2, 4.2, 20000)
    py = rng.uniform(-0.2, 4.2, 20000)
    lx = np.array([p[0] for p in L], float)
    ly = np.array([p[1] for p in L], float)
    inside_p = points_in_rings(px, py, lx, ly, None)
    # exact point-to-boundary distance (segment distance, vectorized)
    d = np.full(px.shape, np.inf)
    n = len(L)
    for i in range(n):
        j = (i + 1) % n
        ex, ey = lx[j] - lx[i], ly[j] - ly[i]
        t = np.clip(((px - lx[i]) * ex + (py - ly[i]) * ey)
                    / (ex * ex + ey * ey), 0.0, 1.0)
        d = np.minimum(d, np.hypot(px - (lx[i] + t * ex),
                                   py - (ly[i] + t * ey)))
    sag = r * (1.0 - math.cos(math.pi / segs))
    decisive = inside_p & (np.abs(d - r) > sag + 1e-6)
    expect = inside_p & (d > r)
    gx = np.asarray(got["xs"]); gy = np.asarray(got["ys"])
    goffs = np.asarray(got["ring_offsets"])
    have = points_in_rings(px, py, gx, gy,
                           goffs if len(goffs) > 2 else None)
    assert (have[decisive] == expect[decisive]).all()


def test_multipart_erodes_both_parts(spark):
    two = _g([[(0, 0), (3, 0), (3, 3), (0, 3)],
              [(10, 0), (13, 0), (13, 3), (10, 3)]], kind=6)
    got = _run(spark, [(1, two)], 0.5)[1]
    assert got is not None and len(got["ring_offsets"]) == 3
    assert abs(abs(_signed_area_sum(got)) - 2 * 4.0) < 1e-9


def test_guard_rails(spark):
    rect = _g([[(0, 0), (4, 0), (4, 2), (0, 2)]])
    df = spark.createDataFrame([(1, rect)], _SCHEMA)
    with pytest.raises(ValueError, match="positive"):
        erode_polygons(df, radius=-1.0)
    with pytest.raises(ValueError, match="segments"):
        erode_polygons(df, radius=0.5, segments=3)
