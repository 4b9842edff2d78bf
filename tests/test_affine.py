"""Affine transforms (operators/affine.py): closed forms, bbox rebuild
under rotation, composition identities, NULL passthrough, and the
zero-Python plan check."""

import math

import numpy as np
from pyspark.sql import functions as F

from spandex_spark import geom
from spandex_spark.operators.affine import (affine_transform, rotate,
                                            scale_geom, translate)
from spandex_spark.sources.grids import geom_struct


def _df(spark):
    df = spark.createDataFrame(
        [(0, 1.0, 2.0, 3.0, 5.0), (1, -1.0, -1.0, 0.0, 0.0)],
        "id long, x0 double, y0 double, x1 double, y1 double")
    return df.select("id", geom_struct(F.col("x0"), F.col("y0"),
                                       F.col("x1"), F.col("y1")).alias("geom"))


def _area(g):
    return geom.rings_area(np.asarray(g["xs"]), np.asarray(g["ys"]),
                           list(g["ring_offsets"]))


def test_translate_closed_form(spark):
    g = {r["id"]: r["geom"] for r in
         translate(_df(spark), dx=10.0, dy=-2.0).collect()}[0]
    assert g["xs"] == [11.0, 13.0, 13.0, 11.0]
    assert g["bbox"]["miny"] == 0.0 and g["bbox"]["maxy"] == 3.0


def test_rotate_90_about_center_bbox_and_area(spark):
    # rect 2x3 rotated 90deg about its center -> bbox swaps extents
    out = rotate(_df(spark), radians=math.pi / 2,
                 origin=(2.0, 3.5)).collect()
    g = {r["id"]: r["geom"] for r in out}[0]
    bb = g["bbox"]
    assert abs(bb["maxx"] - bb["minx"] - 3.0) < 1e-12
    assert abs(bb["maxy"] - bb["miny"] - 2.0) < 1e-12
    assert abs(abs(_area(g)) - 6.0) < 1e-12       # area preserved


def test_scale_about_origin_area(spark):
    g = {r["id"]: r["geom"] for r in
         scale_geom(_df(spark), sx=2.0, sy=3.0,
                    origin=(1.0, 2.0)).collect()}[0]
    assert abs(_area(g) - 6.0 * 6.0) < 1e-12
    assert g["xs"][0] == 1.0 and g["ys"][0] == 2.0   # origin fixed


def test_rotation_roundtrip_identity(spark):
    df = _df(spark)
    back = rotate(rotate(df, radians=0.7, origin=(3.0, -1.0)),
                  radians=-0.7, origin=(3.0, -1.0))
    for r0, r1 in zip(df.collect(), back.collect()):
        assert np.allclose(r0["geom"]["xs"], r1["geom"]["xs"], atol=1e-12)
        assert np.allclose(r0["geom"]["ys"], r1["geom"]["ys"], atol=1e-12)


def test_mirror_flips_orientation(spark):
    g = {r["id"]: r["geom"] for r in
         affine_transform(_df(spark), a=-1.0, b=0.0, d=0.0,
                          e=1.0).collect()}[0]
    signed = geom.shoelace_area(np.asarray(g["xs"]), np.asarray(g["ys"]))
    assert signed < 0      # CCW became CW (documented make_valid caveat)


def test_null_passthrough_and_out_col(spark):
    df = _df(spark).withColumn("geom",
                               F.when(F.col("id") == 0, F.col("geom")))
    out = translate(df, dx=1.0, dy=1.0, out_col="g2").collect()
    got = {r["id"]: r for r in out}
    assert got[1]["g2"] is None
    assert got[0]["geom"]["xs"][0] == 1.0          # original untouched
    assert got[0]["g2"]["xs"][0] == 2.0


def test_zero_python_plan(spark):
    out = rotate(_df(spark), radians=0.3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
