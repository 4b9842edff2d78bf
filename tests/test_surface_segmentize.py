"""point_on_surface + segmentize (operators/simplify.py): containment
on donuts/L-shapes where centroid fails, closed forms, exact length
preservation, max-segment bound, vertex-superset, ring closure."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark import geom
from spandex_spark.operators.lines import line_length
from spandex_spark.operators.simplify import point_on_surface, segmentize

_SCHEMA = ("id long, geom struct<kind:tinyint, xs:array<double>, "
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


def test_donut_point_avoids_hole(spark):
    outer = [(0, 0), (4, 0), (4, 4), (0, 4)]
    hole = [(1, 1), (3, 1), (3, 3), (1, 3)]
    df = spark.createDataFrame([(0, _g(3, [outer, hole]))], _SCHEMA)
    p = point_on_surface(df).collect()[0]["surface_point"]
    g = _g(3, [outer, hole])
    inside = geom.points_in_rings(
        np.array([p["x"]]), np.array([p["y"]]),
        np.asarray(g["xs"]), np.asarray(g["ys"]),
        np.asarray(g["ring_offsets"]))
    assert inside[0]       # in the ring region, NOT in the hole
    # centroid of the donut's vertices would be (2,2) — inside the hole
    assert not (1 < p["x"] < 3 and 1 < p["y"] < 3)


def test_rect_and_line_and_null(spark):
    rect = _g(3, [[(0, 0), (4, 0), (4, 2), (0, 2)]])
    line = _g(2, [[(0, 0), (1, 0), (2, 0)]])
    df = spark.createDataFrame([(0, rect), (1, line), (2, None)], _SCHEMA)
    got = {r["id"]: r["surface_point"]
           for r in point_on_surface(df).collect()}
    assert (got[0]["x"], got[0]["y"]) == (2.0, 1.0)
    assert (got[1]["x"], got[1]["y"]) == (1.0, 0.0)   # middle vertex
    assert got[2] is None


def test_random_polygons_always_inside(spark):
    rng = np.random.default_rng(21)
    rows = []
    for i in range(20):
        # star-shaped polygon around a random center: always simple
        cx, cy = rng.uniform(0, 10, 2)
        angs = np.sort(rng.uniform(0, 2 * np.pi, 9))
        rads = rng.uniform(0.5, 3.0, 9)
        pts = [(cx + r * np.cos(a), cy + r * np.sin(a))
               for a, r in zip(angs, rads)]
        rows.append((i, _g(3, [pts])))
    df = spark.createDataFrame(rows, _SCHEMA)
    got = point_on_surface(df).collect()
    gm = {r[0]: r[1] for r in rows}
    for r in got:
        g = gm[r["id"]]
        inside = geom.points_in_rings(
            np.array([r["surface_point"]["x"]]),
            np.array([r["surface_point"]["y"]]),
            np.asarray(g["xs"]), np.asarray(g["ys"]),
            np.asarray(g["ring_offsets"]))
        assert inside[0], r["id"]


def test_segmentize_line_exact(spark):
    df = spark.createDataFrame(
        [(0, _g(2, [[(0, 0), (10, 0)]]))], _SCHEMA)
    g = segmentize(df, max_length=3.0).collect()[0]["geom"]
    # ceil(10/3) = 4 pieces -> 5 vertices at 0, 2.5, 5, 7.5, 10
    assert g["xs"] == [0.0, 2.5, 5.0, 7.5, 10.0]
    assert all(y == 0.0 for y in g["ys"])


def test_segmentize_preserves_length_and_bounds_segments(spark):
    line = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (-1.0, 4.0)]
    df = spark.createDataFrame([(0, _g(2, [line]))], _SCHEMA)
    out = segmentize(df, max_length=0.7, out_col="dense")
    l0 = line_length(out).collect()[0]["length"]
    l1 = line_length(out.select(F.col("dense").alias("geom")))\
        .collect()[0]["length"]
    assert abs(l0 - l1) < 1e-9
    g = out.collect()[0]["dense"]
    xs, ys = np.asarray(g["xs"]), np.asarray(g["ys"])
    seg = np.hypot(np.diff(xs), np.diff(ys))
    assert seg.max() <= 0.7 + 1e-12
    # original vertices all present
    for vx, vy in line:
        assert np.any((xs == vx) & (ys == vy))


def test_segmentize_polygon_closing_edge_and_area(spark):
    sq = [(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0)]
    df = spark.createDataFrame([(0, _g(3, [sq]))], _SCHEMA)
    g = segmentize(df, max_length=1.0).collect()[0]["geom"]
    xs, ys = np.asarray(g["xs"]), np.asarray(g["ys"])
    assert xs.shape[0] == 12          # 4 edges x 3 pieces, ring open
    assert abs(geom.shoelace_area(xs, ys) - 9.0) < 1e-12
    # the closing edge was densified too: vertices at (0, 2) and (0, 1)
    assert np.any((xs == 0.0) & (ys == 2.0))
    assert np.any((xs == 0.0) & (ys == 1.0))


def test_segmentize_noop_when_short(spark):
    sq = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    df = spark.createDataFrame([(0, _g(3, [sq])), (1, None)], _SCHEMA)
    got = {r["id"]: r["geom"]
           for r in segmentize(df, max_length=10.0).collect()}
    assert got[0]["xs"] == [x for x, _ in sq]
    assert got[1] is None
    with pytest.raises(ValueError):
        segmentize(df, max_length=0.0)
