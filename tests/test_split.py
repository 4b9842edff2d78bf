"""ST_Split + vector polygonize (operators/split.py): closed-form face
areas, donuts, dangles, pass-through, GEOS nested-face semantics."""

import numpy as np
import pytest

from spandex_spark import geom as G
from spandex_spark.operators.split import polygonize_linework, split_by_lines

GEOM_SCHEMA = ("pid long, geom struct<kind:tinyint, xs:array<double>,"
               " ys:array<double>, ring_offsets:array<int>,"
               " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
LINE_SCHEMA = GEOM_SCHEMA.replace("pid", "lid")


def _poly(pid, xs, ys, offsets=None, kind=3):
    xs = [float(v) for v in xs]
    ys = [float(v) for v in ys]
    offsets = offsets or [0, len(xs)]
    return (pid, {"kind": kind, "xs": xs, "ys": ys,
                  "ring_offsets": [int(v) for v in offsets],
                  "bbox": {"minx": min(xs), "miny": min(ys),
                           "maxx": max(xs), "maxy": max(ys)}})


def _rect(pid, x0, y0, x1, y1):
    return _poly(pid, [x0, x1, x1, x0], [y0, y0, y1, y1])


def _line(lid, pts, offsets=None):
    xs = [float(p[0]) for p in pts]
    ys = [float(p[1]) for p in pts]
    offsets = offsets or [0, len(xs)]
    return (lid, {"kind": 2, "xs": xs, "ys": ys,
                  "ring_offsets": [int(v) for v in offsets],
                  "bbox": {"minx": min(xs), "miny": min(ys),
                           "maxx": max(xs), "maxy": max(ys)}})


def _area(g):
    return abs(G.rings_area(np.asarray(g["xs"]), np.asarray(g["ys"]),
                            np.asarray(g["ring_offsets"])))


def test_single_cut_two_faces(spark):
    polys = spark.createDataFrame([_rect(1, 0, 0, 2, 1)], GEOM_SCHEMA)
    blades = spark.createDataFrame(
        [_line(1, [(1, -0.5), (1, 1.5)])], LINE_SCHEMA)
    out = split_by_lines(polys, blades, target_id_col="pid").collect()
    assert len(out) == 2
    areas = sorted(round(_area(r["geom"]), 9) for r in out)
    assert areas == [1.0, 1.0]
    assert sorted(r["face_idx"] for r in out) == [0, 1]


def test_cross_cut_four_faces_and_pass_through(spark):
    polys = spark.createDataFrame(
        [_rect(1, 0, 0, 2, 2), _rect(2, 50, 50, 52, 51)], GEOM_SCHEMA)
    blades = spark.createDataFrame(
        [_line(1, [(1, -1), (1, 3)]), _line(2, [(-1, 1), (3, 1)])],
        LINE_SCHEMA)
    rows = split_by_lines(polys, blades, target_id_col="pid").collect()
    one = [r for r in rows if r["pid"] == 1]
    two = [r for r in rows if r["pid"] == 2]
    assert len(one) == 4
    assert all(round(_area(r["geom"]), 9) == 1.0 for r in one)
    # untouched target passes through unchanged as face 0
    assert len(two) == 1 and two[0]["face_idx"] == 0
    assert two[0]["geom"]["xs"] == [50.0, 52.0, 52.0, 50.0]


def test_dangle_does_not_split(spark):
    polys = spark.createDataFrame([_rect(1, 0, 0, 2, 1)], GEOM_SCHEMA)
    blades = spark.createDataFrame(
        [_line(1, [(1, 0.2), (1, 0.8)])], LINE_SCHEMA)  # interior dangle
    out = split_by_lines(polys, blades, target_id_col="pid").collect()
    assert len(out) == 1
    assert _area(out[0]["geom"]) == pytest.approx(2.0, abs=1e-9)


def test_donut_full_cut_two_c_shapes(spark):
    donut = _poly(1, [0, 4, 4, 0, 1, 1, 3, 3],
                  [0, 0, 4, 4, 1, 3, 3, 1], offsets=[0, 4, 8])
    polys = spark.createDataFrame([donut], GEOM_SCHEMA)
    blades = spark.createDataFrame(
        [_line(1, [(2, -1), (2, 5)])], LINE_SCHEMA)
    out = split_by_lines(polys, blades, target_id_col="pid").collect()
    assert len(out) == 2
    for r in out:
        assert _area(r["geom"]) == pytest.approx(6.0, abs=1e-9)


def test_uncut_donut_keeps_hole(spark):
    donut = _poly(1, [0, 4, 4, 0, 1, 1, 3, 3],
                  [0, 0, 4, 4, 1, 3, 3, 1], offsets=[0, 4, 8])
    polys = spark.createDataFrame([donut], GEOM_SCHEMA)
    # blade overlaps the bbox (kernel runs) but stays inside the HOLE
    blades = spark.createDataFrame(
        [_line(1, [(1.5, 2.0), (2.5, 2.0)])], LINE_SCHEMA)
    out = split_by_lines(polys, blades, target_id_col="pid").collect()
    assert len(out) == 1
    g = out[0]["geom"]
    assert len(g["ring_offsets"]) == 3  # outer + hole survived
    assert _area(g) == pytest.approx(12.0, abs=1e-9)


def test_multipart_blade_and_multi_blades(spark):
    polys = spark.createDataFrame([_rect(1, 0, 0, 3, 1)], GEOM_SCHEMA)
    # one multi-part line carrying two vertical cuts
    blades = spark.createDataFrame(
        [_line(1, [(1, -1), (1, 2), (2, -1), (2, 2)], offsets=[0, 2, 4])],
        LINE_SCHEMA)
    out = split_by_lines(polys, blades, target_id_col="pid").collect()
    assert sorted(round(_area(r["geom"]), 9) for r in out) == [1.0] * 3


def test_polygonize_grid(spark):
    lines = [_line(i, [(x, 0), (x, 2)]) for i, x in enumerate((0, 1, 2))]
    lines += [_line(10 + i, [(0, y), (2, y)]) for i, y in enumerate((0, 1, 2))]
    df = (spark.createDataFrame(lines, LINE_SCHEMA)
          .selectExpr("1 as grp", "geom"))
    out = polygonize_linework(df, group_cols=("grp",)).collect()
    assert len(out) == 4
    assert all(_area(r["geom"]) == pytest.approx(1.0) for r in out)
    assert sorted(r["face_idx"] for r in out) == [0, 1, 2, 3]


def test_polygonize_nested_squares_geos_semantics(spark):
    outer = _line(1, [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)])
    inner = _line(2, [(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)])
    dangle = _line(3, [(10, 10), (11, 11)])
    df = (spark.createDataFrame([outer, inner, dangle], LINE_SCHEMA)
          .selectExpr("1 as grp", "geom"))
    out = polygonize_linework(df, group_cols=("grp",)).collect()
    assert len(out) == 2
    by_area = sorted(out, key=lambda r: _area(r["geom"]))
    assert _area(by_area[0]["geom"]) == pytest.approx(4.0)   # inner square
    assert _area(by_area[1]["geom"]) == pytest.approx(12.0)  # outer - hole
    assert len(by_area[1]["geom"]["ring_offsets"]) == 3


def test_polygonize_groups_isolated(spark):
    sq = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
    rows = [(1, _line(1, sq)[1]), (2, _line(2, sq)[1])]
    df = spark.createDataFrame(
        rows, "grp int, geom " + LINE_SCHEMA.split("geom ")[1])
    out = polygonize_linework(df, group_cols=("grp",)).collect()
    assert len(out) == 2
    assert {r["grp"] for r in out} == {1, 2}


def test_node_lines_crossing(spark):
    from spandex_spark.operators.split import node_lines
    # X crossing at (1,1): two lines -> four noded sub-edges
    lines = [_line(1, [(0, 0), (2, 2)]), _line(2, [(0, 2), (2, 0)])]
    df = (spark.createDataFrame(lines, LINE_SCHEMA)
          .selectExpr("1 as grp", "geom"))
    out = node_lines(df, group_cols=("grp",)).collect()
    assert len(out) == 4
    segs = sorted((tuple(r["geom"]["xs"]), tuple(r["geom"]["ys"]))
                  for r in out)
    assert ((0.0, 1.0), (0.0, 1.0)) in segs      # SW quarter
    assert all((1.0, 1.0) in ((g[0][0], g[1][0]), (g[0][1], g[1][1]))
               or 1.0 in g[0] for g in segs)
    assert sorted(r["edge_idx"] for r in out) == [0, 1, 2, 3]


def test_node_lines_duplicates_collapse(spark):
    from spandex_spark.operators.split import node_lines
    lines = [_line(1, [(0, 0), (1, 0)]), _line(2, [(1, 0), (0, 0)]),
             _line(3, [(0, 0), (1, 0)])]
    df = (spark.createDataFrame(lines, LINE_SCHEMA)
          .selectExpr("1 as grp", "geom"))
    out = node_lines(df, group_cols=("grp",)).collect()
    assert len(out) == 1  # coincident segments collapse to one


def test_island_inside_hole_not_double_covered(spark):
    # review regression: [outer, hole, island] with an uncut blade -
    # the island must NOT also become a hole of the outer face
    geom = _poly(1,
                 [0, 8, 8, 0,  2, 2, 6, 6,  3, 5, 5, 3],
                 [0, 0, 8, 8,  2, 6, 6, 2,  3, 3, 5, 5],
                 offsets=[0, 4, 8, 12])
    polys = spark.createDataFrame([geom], GEOM_SCHEMA)
    blades = spark.createDataFrame(
        [_line(1, [(3.5, 3.5), (4.5, 4.5)])], LINE_SCHEMA)  # dangle
    out = split_by_lines(polys, blades, target_id_col="pid").collect()
    total = sum(_area(r["geom"]) for r in out)
    # region area = (64 - 16) + 4 = 52; double-covering the island
    # would report 56
    assert total == pytest.approx(52.0, abs=1e-9)
    areas = sorted(round(_area(r["geom"]), 9) for r in out)
    assert areas == [4.0, 48.0]


def test_degenerate_target_yields_no_rows_not_crash(spark):
    # review regression: a zero-area target overlapping a blade used to
    # build a 0-column DataFrame and crash the Arrow serializer
    flat = _poly(1, [0, 2, 2, 0], [0, 0, 0, 0])  # zero-area sliver
    polys = spark.createDataFrame([flat], GEOM_SCHEMA)
    blades = spark.createDataFrame(
        [_line(1, [(1, -1), (1, 1)])], LINE_SCHEMA)
    out = split_by_lines(polys, blades, target_id_col="pid").collect()
    assert out == []  # no faces, no crash
