"""Geohash codegen expressions (functions/geohash.py): published test
vectors, decode round-trip, NULL/invalid handling, zero-Python plan."""

import pytest
from pyspark.sql import functions as F

from spandex_spark.functions.geohash import geohash_decode_expr, geohash_expr

# (lon, lat, precision, geohash) — the classic published vectors
VECTORS = [
    (10.40744, 57.64911, 11, "u4pruydqqvj"),   # Wikipedia
    (-5.603, 42.605, 5, "ezs42"),              # original example
    (0.0, 0.0, 9, "s00000000"),
    (-180.0, -90.0, 6, "000000"),
    (179.9999999, 89.9999999, 6, "zzzzzz"),
    (180.0, 90.0, 6, "zzzzzz"),                # edge clamps into last cell
    (-180.5, -90.5, 6, "000000"),              # low end clamps too
]


def test_known_vectors(spark):
    df = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat, _, _) in enumerate(VECTORS)],
        "i long, lon double, lat double")
    for i, (lon, lat, p, want) in enumerate(VECTORS):
        got = (df.filter(F.col("i") == i)
               .select(geohash_expr(F.col("lon"), F.col("lat"), p)
                       .alias("gh")).collect()[0]["gh"])
        assert got == want, (lon, lat, p)


def test_decode_round_trip(spark):
    df = spark.createDataFrame(
        [(gh, p) for (_, _, p, gh) in VECTORS if p == 6]
        + [("9q8yyk8", 7), ("u281z7j", 7)], "gh string, p int")
    out = df.filter(F.col("p") == 7).select(
        "gh", geohash_decode_expr(F.col("gh"), 7).alias("c"))
    for r in out.collect():
        back = (spark.range(1).select(
            geohash_expr(F.lit(r["c"]["lon"]), F.lit(r["c"]["lat"]), 7)
            .alias("gh")).collect()[0]["gh"])
        assert back == r["gh"]  # center re-encodes to the same cell


def test_null_and_invalid(spark):
    row = spark.range(1).select(
        geohash_expr(F.lit(None).cast("double"), F.lit(1.0), 5).alias("a"),
        geohash_decode_expr(F.lit("ezs4a"), 5).alias("b"),   # 'a' invalid
        geohash_decode_expr(F.lit("ezs"), 5).alias("c"),     # too short
    ).collect()[0]
    assert row["a"] is None and row["b"] is None and row["c"] is None


def test_precision_bounds():
    with pytest.raises(ValueError, match="precision"):
        geohash_expr(F.lit(0.0), F.lit(0.0), 13)
    with pytest.raises(ValueError, match="precision"):
        geohash_decode_expr(F.lit("x"), 0)


def test_zero_python_plan(spark):
    df = spark.range(100).select(
        (F.col("id") * 0.1 - 5.0).alias("lon"),
        (F.col("id") * 0.05 - 2.5).alias("lat"))
    out = df.select(geohash_expr(F.col("lon"), F.col("lat"), 8).alias("gh"))
    out = out.select("gh", geohash_decode_expr(F.col("gh"), 8).alias("c"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "*(1) Project" in plan


def test_containment_monotonic(spark):
    """A point's p-char hash is a prefix of its (p+1)-char hash."""
    df = spark.range(200).select(
        (F.col("id") * 1.7 % 360 - 180).alias("lon"),
        (F.col("id") * 0.9 % 180 - 90).alias("lat"))
    out = df.select(
        geohash_expr(F.col("lon"), F.col("lat"), 4).alias("g4"),
        geohash_expr(F.col("lon"), F.col("lat"), 7).alias("g7"))
    assert out.filter(~F.col("g7").startswith(F.col("g4"))).count() == 0
