"""ST_Snap to a reference layer (operators/snap.py): vertex snapping,
vertex insertion, tolerance respected, pass-through, idempotence."""

import numpy as np
import pytest

from spandex_spark.operators.snap import snap_to_layer

GEOM = ("pid long, geom struct<kind:tinyint, xs:array<double>,"
        " ys:array<double>, ring_offsets:array<int>,"
        " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def _g(pid, xs, ys, kind=3, offsets=None):
    xs = [float(v) for v in xs]
    ys = [float(v) for v in ys]
    offsets = offsets or [0, len(xs)]
    return (pid, {"kind": kind, "xs": xs, "ys": ys,
                  "ring_offsets": [int(v) for v in offsets],
                  "bbox": {"minx": min(xs), "miny": min(ys),
                           "maxx": max(xs), "maxy": max(ys)}})


def _rect(pid, x0, y0, x1, y1):
    return _g(pid, [x0, x1, x1, x0], [y0, y0, y1, y1])


def test_vertices_snap_to_reference_corners(spark):
    # a slightly-off square snaps onto the exact reference square
    tgt = spark.createDataFrame(
        [_g(1, [0.004, 1.002, 0.997, -0.003],
            [-0.002, 0.003, 1.004, 0.998])], GEOM)
    ref = spark.createDataFrame([_rect(1, 0, 0, 1, 1)], GEOM)
    g = snap_to_layer(tgt, ref, tolerance=0.01,
                      target_id_col="pid").collect()[0]["geom"]
    assert sorted(zip(g["xs"], g["ys"])) == \
        [(0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0)]


def test_reference_vertex_inserted_into_segment(spark):
    # ref corner (1, 0.005) sits near the target's bottom edge: the
    # snap must INSERT the shared break point (PostGIS phase 2)
    tgt = spark.createDataFrame([_rect(1, 0, 0, 2, 1)], GEOM)
    ref = spark.createDataFrame(
        [_g(2, [1.0, 1.5, 1.5, 1.0],
            [0.005, 0.005, 0.5, 0.5])], GEOM)
    g = snap_to_layer(tgt, ref, tolerance=0.01,
                      target_id_col="pid").collect()[0]["geom"]
    pts = list(zip(g["xs"], g["ys"]))
    assert (1.0, 0.005) in pts  # inserted, in segment order
    i0 = pts.index((0.0, 0.0))
    assert pts[(i0 + 1) % len(pts)] == (1.0, 0.005)


def test_beyond_tolerance_untouched_and_pass_through(spark):
    tgt = spark.createDataFrame(
        [_rect(1, 0.1, 0.1, 0.9, 0.9), _rect(2, 50, 50, 51, 51)], GEOM)
    ref = spark.createDataFrame([_rect(9, 0, 0, 1, 1)], GEOM)
    out = {r["pid"]: r["geom"] for r in
           snap_to_layer(tgt, ref, tolerance=0.01,
                         target_id_col="pid").collect()}
    assert out[1]["xs"] == [0.1, 0.9, 0.9, 0.1]  # 0.1 > tol: unmoved
    assert out[2]["xs"] == [50.0, 51.0, 51.0, 50.0]  # far: pass-through


def test_idempotent(spark):
    tgt = spark.createDataFrame(
        [_g(1, [0.004, 1.002, 0.997, -0.003],
            [-0.002, 0.003, 1.004, 0.998])], GEOM)
    ref = spark.createDataFrame(
        [_g(2, [0, 1, 1, 0, 0.5], [0, 0, 1, 1, 0.002])], GEOM)
    once = snap_to_layer(tgt, ref, tolerance=0.01,
                         target_id_col="pid")
    g1 = once.collect()[0]["geom"]
    again = spark.createDataFrame([(1, g1)], GEOM)
    g2 = snap_to_layer(again, ref, tolerance=0.01,
                       target_id_col="pid").collect()[0]["geom"]
    assert g1["xs"] == g2["xs"] and g1["ys"] == g2["ys"]


def test_line_targets_open_chain(spark):
    tgt = spark.createDataFrame(
        [_g(1, [0.003, 2.002], [0.002, -0.003], kind=2)], GEOM)
    ref = spark.createDataFrame([_rect(9, 0, 0, 2, 1)], GEOM)
    g = snap_to_layer(tgt, ref, tolerance=0.01,
                      target_id_col="pid").collect()[0]["geom"]
    assert list(zip(g["xs"], g["ys"])) == [(0.0, 0.0), (2.0, 0.0)]
    assert g["kind"] == 2  # no wrap edge added
