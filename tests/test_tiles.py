"""Web-Mercator tiling (operators/tiles.py): published quadkey vector,
independent-math parity, DuckDB same-formula parity, pyramid
conservation + parent/child identities, bounds inverse."""

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.tiles import (
    MAX_MERCATOR_LAT, tile_bounds, tile_pyramid, tile_quadkey, tile_xy)


def _py_tile(lon, lat, z):
    n = 1 << z
    lon = ((lon + 180.0) % 360.0) - 180.0
    lat = max(-MAX_MERCATOR_LAT, min(MAX_MERCATOR_LAT, lat))
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    merc = math.log(math.tan(math.radians(lat))
                    + 1.0 / math.cos(math.radians(lat)))
    y = int(math.floor((1.0 - merc / math.pi) / 2.0 * n))
    return min(n - 1, max(0, x)), min(n - 1, max(0, y))


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(11)
    lon = rng.uniform(-179.9, 179.9, 3000)
    lat = rng.uniform(-84.0, 84.0, 3000)
    w = rng.uniform(0, 5, 3000)
    rows = [(int(i), float(lon[i]), float(lat[i]), float(w[i]))
            for i in range(3000)]
    return (spark.createDataFrame(
        rows, "id long, lon double, lat double, w double"), lon, lat, w)


def test_edge_tiles_and_origin(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (-180.0, 0.0), (179.99999, 0.0),
         (0.0, 89.0), (0.0, -89.0)], "lon double, lat double")
    x, y = tile_xy(F.col("lon"), F.col("lat"), 4)
    got = df.select(x.alias("x"), y.alias("y")).collect()
    n = 1 << 4
    assert (got[0]["x"], got[0]["y"]) == (n // 2, n // 2)
    assert got[1]["x"] == 0
    assert got[2]["x"] == n - 1
    assert got[3]["y"] == 0          # above the Mercator bound -> top row
    assert got[4]["y"] == n - 1


def test_quadkey_published_vector(spark):
    # Bing Maps Tile System: tile (x=3, y=5) at level 3 has quadkey "213"
    df = spark.range(1).select(F.lit(3).alias("x"), F.lit(5).alias("y"))
    got = df.select(tile_quadkey(F.col("x"), F.col("y"), 3)
                    .alias("q")).collect()[0]["q"]
    assert got == "213"


def test_tile_xy_matches_independent_math(spark, pts):
    df, lon, lat, _ = pts
    for z in (1, 5, 12):
        x, y = tile_xy(F.col("lon"), F.col("lat"), z)
        rows = df.select("id", x.alias("x"), y.alias("y")).collect()
        for r in rows:
            assert (r["x"], r["y"]) == _py_tile(lon[r["id"]],
                                                lat[r["id"]], z), \
                (r["id"], z)


def test_tile_xy_duckdb_parity(spark, pts):
    df, lon, lat, _ = pts
    z, n = 12, 1 << 12
    x, y = tile_xy(F.col("lon"), F.col("lat"), z)
    got = {r["id"]: (r["x"], r["y"]) for r in
           df.select("id", x.alias("x"), y.alias("y")).collect()}
    import pandas as pd
    con = duckdb.connect()
    con.register("p", pd.DataFrame(
        {"id": range(len(lon)), "lon": lon, "lat": lat}))
    ref = con.execute(f"""
        SELECT id,
          least({n - 1}, greatest(0, CAST(floor(
            ((lon + 180.0) % 360.0) / 360.0 * {float(n)}) AS BIGINT))) x,
          least({n - 1}, greatest(0, CAST(floor(
            (1.0 - ln(tan(radians(l)) + 1.0/cos(radians(l))) / pi())
            / 2.0 * {float(n)}) AS BIGINT))) y
        FROM (SELECT id, lon,
              greatest(-{MAX_MERCATOR_LAT},
                       least({MAX_MERCATOR_LAT}, lat)) l FROM p)
    """).fetchall()
    assert {r[0]: (r[1], r[2]) for r in ref} == got


def test_pyramid_conservation(spark, pts):
    df, _, _, w = pts
    pyr = tile_pyramid(df, min_zoom=2, max_zoom=9,
                       weight_col="w").collect()
    per_z_n = {}
    per_z_w = {}
    for r in pyr:
        per_z_n[r["z"]] = per_z_n.get(r["z"], 0) + r["n"]
        per_z_w[r["z"]] = per_z_w.get(r["z"], 0.0) + r["wsum"]
    for z in range(2, 10):
        assert per_z_n[z] == 3000
        assert per_z_w[z] == pytest.approx(w.sum(), rel=1e-9)
    # every parent aggregates exactly its four children
    by_tile = {(r["z"], r["x"], r["y"]): r["n"] for r in pyr}
    for (z, x, y), cnt in by_tile.items():
        if z == 2:
            continue
        assert by_tile.get((z - 1, x >> 1, y >> 1), 0) >= cnt
    for (z, x, y), cnt in by_tile.items():
        if z == 9:
            continue
        kids = sum(by_tile.get((z + 1, 2 * x + dx, 2 * y + dy), 0)
                   for dx in (0, 1) for dy in (0, 1))
        assert kids == cnt


def test_pyramid_quadkey_prefix_property(spark, pts):
    df, _, _, _ = pts
    pyr = tile_pyramid(df, min_zoom=3, max_zoom=6, quadkey=True).collect()
    keys = {(r["z"], r["x"], r["y"]): r["quadkey"] for r in pyr}
    for (z, x, y), qk in keys.items():
        assert len(qk) == z
        if z > 3:
            assert keys[(z - 1, x >> 1, y >> 1)] == qk[:-1]


def test_bounds_inverse(spark, pts):
    df, _, _, _ = pts
    z = 7
    x, y = tile_xy(F.col("lon"), F.col("lat"), z)
    t = df.select(x.alias("x"), y.alias("y")).distinct()
    w, s, e, nb = tile_bounds(F.col("x"), F.col("y"), z)
    cx = (w + e) / 2
    cy = (s + nb) / 2
    rx, ry = tile_xy(cx, cy, z)
    bad = t.select((F.col("x") == rx).alias("ox"),
                   (F.col("y") == ry).alias("oy")) \
        .filter(~F.col("ox") | ~F.col("oy")).count()
    assert bad == 0


def test_null_coords_dropped_and_plan_jvm(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 1.0), (2, None, 10.0, 1.0), (3, 5.0, None, 1.0)],
        "id long, lon double, lat double, w double")
    pyr = tile_pyramid(df, min_zoom=0, max_zoom=3, weight_col="w")
    rows = pyr.collect()
    assert all(r["n"] == 1 for r in rows)
    assert sum(r["n"] for r in rows if r["z"] == 0) == 1
    plan = pyr._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # exactly one exchange: the groupBy — the explode adds none
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") <= 2   # agg exchange (+AQE read)
