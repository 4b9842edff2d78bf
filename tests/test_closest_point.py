"""ST_ClosestPoint analog (operators/geomdist.py::closest_point):
closed forms incl. the mid-segment projection and the polygon closing
edge, endpoints lie ON their geometries, symmetry of distance,
agreement with hausdorff==0 for identical geoms, NULL contract."""

import math

import numpy as np

from spandex_spark.operators.geomdist import closest_point

_SCHEMA = ("id long, geom_a struct<kind:tinyint, xs:array<double>, "
           "ys:array<double>, ring_offsets:array<int>, "
           "bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>, "
           "geom_b struct<kind:tinyint, xs:array<double>, "
           "ys:array<double>, ring_offsets:array<int>, "
           "bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def _g(kind, parts):
    xs = [float(x) for p in parts for x, _ in p]
    ys = [float(y) for p in parts for _, y in p]
    offs = [0]
    for p in parts:
        offs.append(offs[-1] + len(p))
    return {"kind": kind, "xs": xs, "ys": ys, "ring_offsets": offs,
            "bbox": {"minx": min(xs), "miny": min(ys),
                     "maxx": max(xs), "maxy": max(ys)}}


SQ = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]


def test_point_to_mid_segment(spark):
    # point above the middle of a long segment: the closest point on B
    # is the perpendicular foot, NOT a vertex
    a = _g(2, [[(5.0, 3.0), (5.0, 4.0)]])
    b = _g(2, [[(0.0, 0.0), (10.0, 0.0)]])
    df = spark.createDataFrame([(0, a, b)], _SCHEMA)
    c = closest_point(df).collect()[0]["closest"]
    assert (c["ax"], c["ay"]) == (5.0, 3.0)
    assert (c["bx"], c["by"]) == (5.0, 0.0)
    assert c["dist"] == 3.0


def test_polygon_closing_edge(spark):
    # probe left of the unit square: nearest point lies ON the implicit
    # closing edge x=0 at the probe's own y
    a = _g(2, [[(-0.4, 0.5), (-0.3, 0.5)]])
    df = spark.createDataFrame([(0, a, _g(3, [SQ]))], _SCHEMA)
    c = closest_point(df).collect()[0]["closest"]
    assert abs(c["dist"] - 0.3) < 1e-12
    assert (c["bx"], c["by"]) == (0.0, 0.5)
    assert (c["ax"], c["ay"]) == (-0.3, 0.5)


def test_symmetric_distance_and_swap(spark):
    a = _g(3, [SQ])
    b = _g(3, [[(x + 5, y + 2) for x, y in SQ]])
    df = spark.createDataFrame([(0, a, b), (1, b, a)], _SCHEMA)
    got = {r["id"]: r["closest"] for r in closest_point(df).collect()}
    assert abs(got[0]["dist"] - got[1]["dist"]) < 1e-12
    assert abs(got[0]["dist"] - math.hypot(4.0, 1.0)) < 1e-12
    # swapped inputs swap the endpoints
    assert (got[0]["ax"], got[0]["ay"]) == (got[1]["bx"], got[1]["by"])


def test_identical_geometries_zero(spark):
    df = spark.createDataFrame([(0, _g(3, [SQ]), _g(3, [SQ]))], _SCHEMA)
    assert closest_point(df).collect()[0]["closest"]["dist"] == 0.0


def test_endpoints_lie_on_geometries(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(10):
        a = [(float(x), float(y)) for x, y in rng.uniform(0, 3, (4, 2))]
        b = [(float(x) + 5, float(y)) for x, y in rng.uniform(0, 3, (4, 2))]
        rows.append((i, _g(2, [a]), _g(2, [b])))
    df = spark.createDataFrame(rows, _SCHEMA)
    for r in closest_point(df).collect():
        c = r["closest"]
        ga, gb = None, None
        for rid, a, b in rows:
            if rid == r["id"]:
                ga, gb = a, b
        # verify each endpoint sits on some segment of its geometry
        for (px, py), parts in (((c["ax"], c["ay"]), ga),
                                ((c["bx"], c["by"]), gb)):
            pts = parts["xs"], parts["ys"]
            on = False
            for j in range(len(pts[0]) - 1):
                x1, y1 = pts[0][j], pts[1][j]
                x2, y2 = pts[0][j + 1], pts[1][j + 1]
                cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
                dot = (px - x1) * (x2 - x1) + (py - y1) * (y2 - y1)
                ln = (x2 - x1) ** 2 + (y2 - y1) ** 2
                if abs(cross) < 1e-9 * max(ln, 1) and -1e-12 <= dot <= ln + 1e-9:
                    on = True
                    break
            assert on, (r["id"], px, py)


def test_null_contract(spark):
    df = spark.createDataFrame([(0, None, _g(3, [SQ]))], _SCHEMA)
    assert closest_point(df).collect()[0]["closest"] is None
