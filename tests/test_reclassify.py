"""Raster reclassification (operators/zonal.py::reclassify): bucket
ladder closed form (right-inclusive last interval), out-of-range and
NaN to nodata, validation, and the map-only plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.zonal import reclassify


def _tiles(spark, vals):
    return spark.createDataFrame(
        [(0, 0.0, 0.0, 1.0, len(vals), 1, vals)],
        "tile_id long, x0 double, y0 double, res double, "
        "nx int, ny int, values array<double>")


def test_ladder_closed_form(spark):
    vals = [-5.0, 0.0, 9.99, 10.0, 49.9, 50.0, 100.0, 150.0,
            float("nan")]
    out = reclassify(_tiles(spark, vals), [0, 10, 50, 100],
                     [1, 2, 3], nodata_class=-9.0)
    got = out.collect()[0]["values"]
    #            -5   0    9.99 10   49.9 50   100  150  nan
    assert got == [-9.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, -9.0, -9.0]


def test_nan_nodata_default(spark):
    out = reclassify(_tiles(spark, [5.0, float("nan"), 200.0]),
                     [0, 10], [7])
    got = out.collect()[0]["values"]
    assert got[0] == 7.0 and math.isnan(got[1]) and math.isnan(got[2])


def test_validation(spark):
    t = _tiles(spark, [1.0])
    with pytest.raises(ValueError):
        reclassify(t, [0, 10], [1, 2])
    with pytest.raises(ValueError):
        reclassify(t, [10, 0], [1])


def test_map_only_plan(spark):
    out = reclassify(_tiles(spark, [1.0, 2.0]), [0, 10], [1])
    plan = out._jdf.queryExecution().executedPlan().toString()
    for op in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
               "Exchange"):
        assert op not in plan
