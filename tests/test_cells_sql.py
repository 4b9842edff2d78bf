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


def test_bbox_cells_expr_bit_identical(spark):
    """The JVM bbox cover must equal cells.cover_bbox cell-for-cell on
    random boxes (incl. out-of-window clamping) at several levels."""
    import numpy as np
    from pyspark.sql import functions as F
    from spandex_spark import cells as C
    from spandex_spark.functions.cells_sql import bbox_cells_expr
    rng = np.random.default_rng(17)
    rows = []
    for i in range(300):
        x0 = float(rng.uniform(-200, 190))
        y0 = float(rng.uniform(-100, 85))
        x1 = x0 + float(rng.uniform(0, 15))
        y1 = y0 + float(rng.uniform(0, 15))
        rows.append((i, x0, y0, x1, y1))
    df = spark.createDataFrame(
        rows, "i long, x0 double, y0 double, x1 double, y1 double")
    for level in (5, 9, 13):
        got = {r.i: list(r.c) for r in df.select(
            "i", bbox_cells_expr(F.col("x0"), F.col("y0"), F.col("x1"),
                                 F.col("y1"), level).alias("c")).collect()}
        for i, x0, y0, x1, y1 in rows:
            want = C.cover_bbox(x0, y0, x1, y1, level).tolist()
            assert sorted(got[i]) == sorted(want), (i, level)
