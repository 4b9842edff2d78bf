"""Deterministic in-Spark layer builders (zones / parcels / gazetteer grid /
raster tiles / derived points).

All closed-form and built entirely from ``spark.range`` + JVM expressions
(no Python, no external data), so an external SQL engine (the driver's
DuckDB oracle) can reproduce them bit-for-bit from the same arithmetic.
These mirror the FIXTURES.md layers; the parquet fixture generators in
fixtures.py produce the same shapes for pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def geom_struct(x0, y0, x1, y1):
    """Axis-aligned-rectangle geometry struct (SoA encoding, SURVEY.md §1.2)."""
    return F.struct(
        F.lit(3).cast("tinyint").alias("kind"),
        F.array(x0, x1, x1, x0).alias("xs"),
        F.array(y0, y0, y1, y1).alias("ys"),
        F.array(F.lit(0), F.lit(4)).alias("ring_offsets"),
        F.struct(x0.alias("minx"), y0.alias("miny"),
                 x1.alias("maxx"), y1.alias("maxy")).alias("bbox"),
    )


def donut_zones_df(spark: SparkSession) -> DataFrame:
    """4x4 grid of 4-degree squares over [-8, 8), each with a centered
    2-degree square hole — the holed-polygon layer (PostGIS-native in the
    reference via ST_Contains on POLYGON with interior rings;
    spandex/spatialtoolz.py::tag). Outer ring CCW, hole ring CW, all
    closed-form JVM arithmetic so a SQL oracle reproduces it exactly."""
    z = spark.range(16).select(F.col("id").alias("dz_id"))
    c = F.col("dz_id") % 4
    r = (F.col("dz_id") - c) / 4
    x0 = (c * 4 - 8).cast("double")
    y0 = (r * 4 - 8).cast("double")
    x1 = x0 + 4.0
    y1 = y0 + 4.0
    hx0, hy0 = x0 + 1.0, y0 + 1.0
    hx1, hy1 = x0 + 3.0, y0 + 3.0
    geom = F.struct(
        F.lit(6).cast("tinyint").alias("kind"),
        F.array(x0, x1, x1, x0, hx0, hx0, hx1, hx1).alias("xs"),
        F.array(y0, y0, y1, y1, hy0, hy1, hy1, hy0).alias("ys"),
        F.array(F.lit(0), F.lit(4), F.lit(8)).alias("ring_offsets"),
        F.struct(x0.alias("minx"), y0.alias("miny"),
                 x1.alias("maxx"), y1.alias("maxy")).alias("bbox"))
    return z.select("dz_id", geom.alias("geom"))


def multipart_zones_df(spark: SparkSession) -> DataFrame:
    """8 two-part multipolygon zones: part k spans x in [-8+2k, -7+2k) with
    a southern part (lat [-6,-5)) and a disjoint northern part (lat [3,4)),
    sharing one zone id — the MULTIPOLYGON layer. Both rings CCW."""
    z = spark.range(8).select(F.col("id").alias("mz_id"))
    x0 = (F.col("mz_id") * 2 - 8).cast("double")
    x1 = x0 + 1.0
    geom = F.struct(
        F.lit(6).cast("tinyint").alias("kind"),
        F.array(x0, x1, x1, x0, x0, x1, x1, x0).alias("xs"),
        F.array(F.lit(-6.0), F.lit(-6.0), F.lit(-5.0), F.lit(-5.0),
                F.lit(3.0), F.lit(3.0), F.lit(4.0), F.lit(4.0)).alias("ys"),
        F.array(F.lit(0), F.lit(4), F.lit(8)).alias("ring_offsets"),
        F.struct(x0.alias("minx"), F.lit(-6.0).alias("miny"),
                 x1.alias("maxx"), F.lit(4.0).alias("maxy")).alias("bbox"))
    return z.select("mz_id", geom.alias("geom"))


def roads_df(spark: SparkSession) -> DataFrame:
    """17 meridional 'road' linestrings at integer lon -8..8, each spanning
    lat [-10, 10] with a mid vertex (so point-to-segment, not just
    point-to-endpoint, is exercised). kind=2 = linestring; parts OPEN."""
    r = spark.range(17).select(F.col("id").alias("road_id"))
    x = (F.col("road_id") - 8).cast("double")
    geom = F.struct(
        F.lit(2).cast("tinyint").alias("kind"),
        F.array(x, x, x).alias("xs"),
        F.array(F.lit(-10.0), F.lit(0.0), F.lit(10.0)).alias("ys"),
        F.array(F.lit(0), F.lit(3)).alias("ring_offsets"),
        F.struct(x.alias("minx"), F.lit(-10.0).alias("miny"),
                 x.alias("maxx"), F.lit(10.0).alias("maxy")).alias("bbox"))
    return r.select("road_id", geom.alias("geom"))


def derived_points(df: DataFrame, key_col: str) -> DataFrame:
    """Deterministic point per row: lon/lat on a 0.01-degree lattice in the
    ±10-degree world window, derived from an integer key by exact integer
    arithmetic (reproducible in any SQL engine):
    lon = ((key*7919) % 2000)/100 - 10, lat = ((key*104729) % 2000)/100 - 10.
    """
    k = F.col(key_col).cast("long")
    return (df
            .withColumn("lon", ((k * 7919) % 2000) / F.lit(100.0) - 10.0)
            .withColumn("lat", ((k * 104729) % 2000) / F.lit(100.0) - 10.0))


def zones_df(spark: SparkSession) -> DataFrame:
    """FIXTURES.md §3: 20x20 grid of 1-degree squares over the window."""
    z = spark.range(400).select(F.col("id").alias("zone_id"))
    col = F.col("zone_id") % 20
    row = (F.col("zone_id") - col) / 20
    x0 = (col - 10).cast("double")
    y0 = (row - 10).cast("double")
    return z.select(
        "zone_id",
        geom_struct(x0, y0, x0 + 1.0, y0 + 1.0).alias("geom"),
        F.element_at(F.array(F.lit("res"), F.lit("com"), F.lit("ind"), F.lit("open")),
                     (F.col("zone_id") % 4 + 1).cast("int")).alias("zclass"))


def parcels_df(spark: SparkSession) -> DataFrame:
    """FIXTURES.md §4: 40x40 grid of 0.5-degree squares shifted (0.25, 0.25),
    clipped to the window."""
    p = spark.range(1600).select(F.col("id").alias("parcel_id"))
    col = F.col("parcel_id") % 40
    row = (F.col("parcel_id") - col) / 40
    x0 = -10.0 + 0.25 + 0.5 * col.cast("double")
    y0 = -10.0 + 0.25 + 0.5 * row.cast("double")
    x1 = F.least(x0 + 0.5, F.lit(10.0))
    y1 = F.least(y0 + 0.5, F.lit(10.0))
    return p.select(
        "parcel_id", geom_struct(x0, y0, x1, y1).alias("geom"),
        (1000.0 + (F.col("parcel_id") % 17).cast("double") * 37.5).alias("land_value"))


def gazetteer_grid_df(spark: SparkSession) -> DataFrame:
    """FIXTURES.md §2: 32 synthetic places on a fixed grid."""
    g = spark.range(32).select(F.col("id").alias("k"))
    return g.select(
        F.format_string("ville%02d", F.col("k")).alias("place"),
        (-8.0 + (F.col("k") % 8).cast("double")).alias("lon"),
        (-8.0 + 2.0 * F.floor(F.col("k") / 8).cast("double")).alias("lat"),
        F.col("k").alias("poi_k"))


def raster_tiles_df(spark: SparkSession) -> DataFrame:
    """FIXTURES.md §6: 8x8 tiles x 50x50 px, res 0.05 deg,
    v = sin(lon_c) + cos(lat_c) — values built JVM-side via transform()."""
    t = spark.range(64).select(F.col("id").alias("tile_id"))
    tx = F.col("tile_id") % 8
    ty = (F.col("tile_id") - tx) / 8
    x0 = (-10.0 + tx.cast("double") * 2.5)
    y0 = (-10.0 + ty.cast("double") * 2.5)
    res = F.lit(0.05)
    # row-major pixel index p: row = p div 50, col = p mod 50
    values = F.transform(
        F.sequence(F.lit(0), F.lit(2499)),
        lambda p: F.sin(x0 + ((p % 50).cast("double") + 0.5) * res)
        + F.cos(y0 + (F.floor(p / 50).cast("double") + 0.5) * res))
    return t.select("tile_id", x0.alias("x0"), y0.alias("y0"),
                    res.alias("res"), F.lit(50).alias("nx"), F.lit(50).alias("ny"),
                    values.alias("values"))


def validity_zoo_df(spark: SparkSession) -> DataFrame:
    """64 closed-form geometries exercising O6 validation
    (spandex/spatialtoolz.py::invalid_geometry_check /
    ::duplicate_stacked_geometry_check): gid 0..63, base = gid % 32 (so
    every geometry appears EXACTLY TWICE — stacked duplicates), placed on
    an 8x4 grid of 2-degree slots. Type = base % 4:

      0  valid CCW unit square
      1  bowtie (self-intersecting quad)         -> invalid
      2  four collinear points (zero area)       -> invalid
      3  valid CCW triangle

    All arithmetic is integer/half-integer, reproducible in any SQL engine
    as pure case logic."""
    g = spark.range(64).select(F.col("id").alias("gid"))
    base = F.col("gid") % 32
    t = base % 4
    x0 = (-8 + (base % 8) * 2).cast("double")
    y0 = (-8 + F.floor(base / 8) * 2).cast("double")
    sq_xs = F.array(x0, x0 + 1.0, x0 + 1.0, x0)
    sq_ys = F.array(y0, y0, y0 + 1.0, y0 + 1.0)
    bow_ys = F.array(y0, y0 + 1.0, y0, y0 + 1.0)
    col_xs = F.array(x0, x0 + 1.0, x0 + 2.0, x0 + 0.5)
    col_ys = F.array(y0, y0, y0, y0)
    tri_xs = F.array(x0, x0 + 1.0, x0)
    tri_ys = F.array(y0, y0, y0 + 1.0)
    xs = (F.when(t == 2, col_xs).when(t == 3, tri_xs).otherwise(sq_xs))
    ys = (F.when(t == 1, bow_ys).when(t == 2, col_ys)
          .when(t == 3, tri_ys).otherwise(sq_ys))
    offs = F.when(t == 3, F.array(F.lit(0), F.lit(3))) \
            .otherwise(F.array(F.lit(0), F.lit(4)))
    geom = F.struct(
        F.lit(3).cast("tinyint").alias("kind"),
        xs.alias("xs"), ys.alias("ys"), offs.alias("ring_offsets"),
        F.struct(x0.alias("minx"), y0.alias("miny"),
                 (x0 + 2.0).alias("maxx"), (y0 + 2.0).alias("maxy")).alias("bbox"))
    return g.select("gid", geom.alias("geom"))
