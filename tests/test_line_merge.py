"""ST_LineMerge analog (operators/lines.py::line_merge)."""

import numpy as np
import pytest

from spandex_spark.operators.lines import line_merge

SCHEMA = ("lid long, geom struct<kind:tinyint, xs:array<double>,"
          " ys:array<double>, ring_offsets:array<int>,"
          " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def _ml(lid, parts):
    xs, ys, offs = [], [], [0]
    for px, py in parts:
        xs += [float(v) for v in px]
        ys += [float(v) for v in py]
        offs.append(len(xs))
    return (lid, {"kind": 2, "xs": xs, "ys": ys, "ring_offsets": offs,
                  "bbox": {"minx": min(xs), "miny": min(ys),
                           "maxx": max(xs), "maxy": max(ys)}})


def _parts(g):
    o = g["ring_offsets"]
    return [(list(g["xs"][o[p]:o[p + 1]]), list(g["ys"][o[p]:o[p + 1]]))
            for p in range(len(o) - 1)]


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["lid"]: r["geom"] for r in line_merge(df).collect()}


def test_chain_out_of_order_and_reversed(spark):
    # three collinear pieces, middle one REVERSED, given out of order
    rows = [_ml(1, [([2, 3], [0, 0]),        # c
                    ([2, 1], [0, 0]),        # b reversed
                    ([0, 1], [0, 0])])]      # a
    g = _run(spark, rows)[1]
    parts = _parts(g)
    assert len(parts) == 1
    xs, ys = parts[0]
    assert xs in ([0, 1, 2, 3], [3, 2, 1, 0])
    assert ys == [0, 0, 0, 0]


def test_three_way_junction_not_merged_through(spark):
    # a Y: three parts meeting at (1,0) — PostGIS rule: no merge
    rows = [_ml(1, [([0, 1], [0, 0]), ([1, 2], [0, 0]), ([1, 1], [0, 1])])]
    parts = _parts(_run(spark, rows)[1])
    assert len(parts) == 3


def test_two_disjoint_chains(spark):
    rows = [_ml(1, [([0, 1], [0, 0]), ([1, 2], [0, 0]),
                    ([5, 6], [5, 5]), ([6, 7], [5, 5])])]
    parts = _parts(_run(spark, rows)[1])
    assert len(parts) == 2
    lens = sorted(len(p[0]) for p in parts)
    assert lens == [3, 3]


def test_closed_ring_chains_to_one_part(spark):
    rows = [_ml(1, [([0, 1], [0, 0]), ([1, 1], [0, 1]),
                    ([1, 0], [1, 1]), ([0, 0], [1, 0])])]
    parts = _parts(_run(spark, rows)[1])
    assert len(parts) == 1
    xs, ys = parts[0]
    assert len(xs) == 5
    assert (xs[0], ys[0]) == (xs[-1], ys[-1])  # closed


def test_passthrough_and_bbox(spark):
    poly = (7, {"kind": 3, "xs": [0.0, 1.0, 1.0, 0.0],
                "ys": [0.0, 0.0, 1.0, 1.0], "ring_offsets": [0, 4],
                "bbox": {"minx": 0.0, "miny": 0.0, "maxx": 1.0, "maxy": 1.0}})
    rows = [_ml(1, [([0, 1], [0, 0]), ([1, 2], [0, 3])]), poly, (9, None)]
    out = _run(spark, rows)
    assert out[7]["kind"] == 3          # polygon untouched
    assert out[9] is None
    g = out[1]
    assert (g["bbox"]["maxx"], g["bbox"]["maxy"]) == (2.0, 3.0)


def test_single_part_identity(spark):
    rows = [_ml(1, [([0, 1, 2], [0, 1, 0])])]
    parts = _parts(_run(spark, rows)[1])
    assert parts == [([0.0, 1.0, 2.0], [0.0, 1.0, 0.0])]
