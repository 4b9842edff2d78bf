"""ST_Azimuth / ST_Project analogs (functions/geodesy.py)."""

import math

import pytest
from pyspark.sql import functions as F

from spandex_spark.functions.geodesy import azimuth_expr, project_expr
from spandex_spark.geom import EARTH_RADIUS_M


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


def test_cardinal_azimuths(spark):
    cases = [((0, 0), (1, 0), math.pi / 2),    # east
             ((0, 0), (0, 1), 0.0),            # north
             ((0, 0), (-1, 0), 3 * math.pi / 2),  # west
             ((0, 0), (0, -1), math.pi)]       # south
    for (lo1, la1), (lo2, la2), want in cases:
        got = _one(spark, azimuth_expr(F.lit(float(lo1)), F.lit(float(la1)),
                                       F.lit(float(lo2)), F.lit(float(la2))))
        assert got == pytest.approx(want, abs=1e-12), ((lo1, la1, lo2, la2))


def test_coincident_points_null(spark):
    got = _one(spark, azimuth_expr(F.lit(5.0), F.lit(5.0),
                                   F.lit(5.0), F.lit(5.0)))
    assert got is None


def test_project_north_exact(spark):
    # 1 degree of arc due north from the equator
    d = EARTH_RADIUS_M * math.pi / 180.0
    got = _one(spark, project_expr(F.lit(10.0), F.lit(0.0),
                                   F.lit(d), F.lit(0.0)))
    assert got["lon"] == pytest.approx(10.0, abs=1e-9)
    assert got["lat"] == pytest.approx(1.0, abs=1e-9)


def test_project_antimeridian_wrap(spark):
    d = EARTH_RADIUS_M * math.pi / 180.0 * 2.0  # 2 deg of arc due east
    got = _one(spark, project_expr(F.lit(179.0), F.lit(0.0),
                                   F.lit(d), F.lit(math.pi / 2)))
    assert got["lon"] == pytest.approx(-179.0, abs=1e-9)
    assert got["lat"] == pytest.approx(0.0, abs=1e-6)


def test_project_roundtrip_distance_and_bearing(spark):
    """haversine(p, project(p, d, θ)) == d and azimuth(p, ·) == θ for a
    grid of bearings/distances — all inside one JVM plan."""
    df = (spark.range(16)
          .select((F.col("id") * (2 * math.pi / 16)).alias("theta"),
                  F.lit(25.0).alias("lon"), F.lit(40.0).alias("lat"),
                  F.lit(250_000.0).alias("d")))
    dest = project_expr(F.col("lon"), F.col("lat"), F.col("d"),
                        F.col("theta"))
    out = df.select(
        "theta",
        azimuth_expr(F.col("lon"), F.col("lat"),
                     dest["lon"], dest["lat"]).alias("az_back"),
        (F.asin(F.sqrt(
            F.pow(F.sin((F.radians(dest["lat"]) - F.radians("lat")) / 2), 2)
            + F.cos(F.radians("lat")) * F.cos(F.radians(dest["lat"]))
            * F.pow(F.sin((F.radians(dest["lon"]) - F.radians("lon")) / 2), 2)
        )) * 2 * EARTH_RADIUS_M).alias("d_back")).collect()
    for r in out:
        assert r["d_back"] == pytest.approx(250_000.0, rel=1e-9)
        assert r["az_back"] == pytest.approx(r["theta"] % (2 * math.pi),
                                             abs=1e-9)


def test_all_jvm(spark):
    df = spark.range(10).select(F.col("id").cast("double").alias("x"))
    expr = project_expr(F.col("x"), F.col("x"), F.lit(1000.0),
                        azimuth_expr(F.col("x"), F.col("x"),
                                     F.col("x") + 1, F.col("x") + 1))
    plan = (df.select(expr.alias("p"))
            ._jdf.queryExecution().executedPlan().toString())
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan


def test_great_circle_points(spark):
    from spandex_spark.functions.geodesy import great_circle_points
    from spandex_spark.geom import EARTH_RADIUS_M
    import math
    df = spark.createDataFrame([(-60.0, 10.0, 50.0, 55.0)],
                               "lon1 double, lat1 double, "
                               "lon2 double, lat2 double")
    pts = df.select(great_circle_points(
        F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2"),
        16).alias("p")).collect()[0]["p"]
    assert len(pts) == 17
    assert (pts[0]["lon"], pts[0]["lat"]) == pytest.approx((-60.0, 10.0))
    assert (pts[-1]["lon"], pts[-1]["lat"]) == pytest.approx((50.0, 55.0))

    def hav(a, b):
        p1, p2 = math.radians(a[1]), math.radians(b[1])
        dl = math.radians(b[0] - a[0])
        h = (math.sin((p2 - p1) / 2) ** 2
             + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
        return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(h))

    steps = [hav((pts[i]["lon"], pts[i]["lat"]),
                 (pts[i + 1]["lon"], pts[i + 1]["lat"]))
             for i in range(16)]
    total = hav((-60.0, 10.0), (50.0, 55.0))
    # equal arc steps, and their sum is the direct great-circle distance
    for s in steps:
        assert s == pytest.approx(steps[0], rel=1e-9)
    assert sum(steps) == pytest.approx(total, rel=1e-9)
    # the midpoint of a great circle is NOT the planar midpoint (the
    # whole reason to densify geodesically): this route arcs far north
    assert pts[8]["lat"] > 45.0
    # coincident points degrade to the two endpoints
    same = spark.createDataFrame([(5.0, 5.0)], "lon double, lat double")
    got = same.select(great_circle_points(
        F.col("lon"), F.col("lat"), F.col("lon"), F.col("lat"),
        8).alias("p")).collect()[0]["p"]
    assert len(got) == 2
    with pytest.raises(ValueError):
        great_circle_points(F.col("lon1"), F.col("lat1"),
                            F.col("lon2"), F.col("lat2"), 0)
