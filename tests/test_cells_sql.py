"""JVM cell expression must be bit-identical to the numpy kernel."""

import numpy as np
from pyspark.sql import functions as F

from spandex_spark import cells
from spandex_spark.functions.cells_sql import cell_of_expr, cell_parent_expr


def test_expr_matches_numpy_kernel(spark):
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    # include exact lattice/boundary points
    lon[:10] = [-180.0, -10.0, 0.0, 9.99, 10.0, 179.99, -0.01, 5.43, -4.57, 1.0]
    lat[:10] = [-90.0, -10.0, 0.0, 9.99, 10.0, 89.99, -0.01, 5.43, -4.57, 1.0]
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], ["lon", "lat"])
    for level in (0, 5, 9, 17, 29):
        got = np.array([r.c for r in df.select(
            cell_of_expr(F.col("lon"), F.col("lat"), level).alias("c")).collect()])
        want = cells.cell_of(lon, lat, level)
        np.testing.assert_array_equal(got, want)


def test_parent_expr_matches_numpy(spark):
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], ["lon", "lat"])
    c = df.select(cell_of_expr(F.col("lon"), F.col("lat"), 12).alias("c"))
    got = np.array([r.p for r in c.select(
        cell_parent_expr(F.col("c"), 12, 7).alias("p")).collect()])
    want = cells.parent(cells.cell_of(lon, lat, 12), 7)
    np.testing.assert_array_equal(got, want)
