"""ST_LineSubstring (operators/lines.py::line_substring): closed-form
right-angle polyline, identity at (0,1), adjacency/length-additivity,
agreement with line_interpolate at the cut point, multi-part NULL."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.lines import (line_interpolate, line_length,
                                           line_substring)


def _line_df(spark, parts, ident=0):
    """parts: list of vertex lists [(x, y), ...]."""
    xs = [float(x) for p in parts for x, _ in p]
    ys = [float(y) for p in parts for _, y in p]
    offs = [0]
    for p in parts:
        offs.append(offs[-1] + len(p))
    row = (ident, {"kind": 2, "xs": xs, "ys": ys, "ring_offsets": offs,
                   "bbox": {"minx": min(xs), "miny": min(ys),
                            "maxx": max(xs), "maxy": max(ys)}})
    schema = ("id long, geom struct<kind:tinyint, xs:array<double>, "
              "ys:array<double>, ring_offsets:array<int>, "
              "bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
    return spark.createDataFrame([row], schema)


L = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0)]   # total length 8


def test_closed_form_right_angle(spark):
    g = line_substring(_line_df(spark, [L]), start=0.25,
                       end=0.75).collect()[0]["geom_sub"]
    # 0.25*8 = 2 -> (2,0); 0.75*8 = 6 -> (4,2); corner (4,0) kept
    assert g["xs"] == [2.0, 4.0, 4.0]
    assert g["ys"] == [0.0, 0.0, 2.0]


def test_identity_full_range(spark):
    g = line_substring(_line_df(spark, [L]), start=0.0,
                       end=1.0).collect()[0]["geom_sub"]
    assert g["xs"] == [x for x, _ in L] and g["ys"] == [y for _, y in L]


def test_adjacent_pieces_share_cut_and_sum_lengths(spark):
    df = _line_df(spark, [L])
    a = line_substring(df, start=0.0, end=0.3, out_col="g1")
    b = line_substring(a, start=0.3, end=1.0, out_col="g2")
    la = line_length(b.select(F.col("g1").alias("geom")))\
        .collect()[0]["length"]
    lb = line_length(b.select(F.col("g2").alias("geom")))\
        .collect()[0]["length"]
    assert abs(la - 0.3 * 8) < 1e-12 and abs(lb - 0.7 * 8) < 1e-12
    r = b.collect()[0]
    assert r["g1"]["xs"][-1] == r["g2"]["xs"][0]
    assert r["g1"]["ys"][-1] == r["g2"]["ys"][0]


def test_start_matches_line_interpolate(spark):
    df = _line_df(spark, [L])
    p = line_interpolate(df, fraction=0.6).collect()[0]["point"]
    g = line_substring(df, start=0.6, end=1.0).collect()[0]["geom_sub"]
    assert (g["xs"][0], g["ys"][0]) == (p["x"], p["y"])


def test_multipart_null_and_bad_args(spark):
    df = _line_df(spark, [L, [(9.0, 9.0), (10.0, 9.0)]])
    assert line_substring(df, start=0.1,
                          end=0.9).collect()[0]["geom_sub"] is None
    with pytest.raises(ValueError):
        line_substring(df, start=0.5, end=0.5)
    with pytest.raises(ValueError):
        line_substring(df, start=-0.1, end=0.5)


def test_cut_inside_single_segment(spark):
    g = line_substring(_line_df(spark, [[(0.0, 0.0), (10.0, 0.0)]]),
                       start=0.2, end=0.4).collect()[0]["geom_sub"]
    assert g["xs"] == [2.0, 4.0] and g["ys"] == [0.0, 0.0]
    assert g["bbox"]["minx"] == 2.0 and g["bbox"]["maxx"] == 4.0
