"""ST_SnapToGrid analog (operators/simplify.py::snap_to_grid)."""

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.simplify import snap_to_grid

GEOM_SCHEMA = ("pid long, geom struct<kind:tinyint, xs:array<double>,"
               " ys:array<double>, ring_offsets:array<int>,"
               " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def _df(spark):
    rows = [
        (1, {"kind": 3, "xs": [0.04, 1.96, 2.04, 0.04], "ys": [0.06, 0.06, 1.94, 0.06],
             "ring_offsets": [0, 4],
             "bbox": {"minx": 0.04, "miny": 0.06, "maxx": 2.04, "maxy": 1.94}}),
        (2, None),
    ]
    return spark.createDataFrame(rows, GEOM_SCHEMA)


def test_vertices_snap_and_bbox_recomputed(spark):
    out = {r["pid"]: r["geom"]
           for r in snap_to_grid(_df(spark), size=0.1).collect()}
    g = out[1]
    # binary-FP artifact expected: 19*0.1 = 1.9000000000000001
    assert [round(v, 9) for v in g["xs"]] == [0.0, 2.0, 2.0, 0.0]
    assert [round(v, 9) for v in g["ys"]] == [0.1, 0.1, 1.9, 0.1]
    assert g["ring_offsets"] == [0, 4]  # collapsed duplicates KEPT
    assert (round(g["bbox"]["minx"], 9), round(g["bbox"]["maxy"], 9)) \
        == (0.0, 1.9)
    assert out[2] is None


def test_out_col_and_identity_on_grid(spark):
    df = snap_to_grid(_df(spark), size=0.01, out_col="snapped")
    r = df.filter("pid = 1").collect()[0]
    assert [round(v, 9) for v in r["snapped"]["xs"]] == list(r["geom"]["xs"])


def test_zero_python_plan(spark):
    plan = (snap_to_grid(_df(spark), size=0.5)
            ._jdf.queryExecution().executedPlan().toString())
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan


def test_bad_size(spark):
    with pytest.raises(ValueError, match="size"):
        snap_to_grid(_df(spark), size=0.0)
