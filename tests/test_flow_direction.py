"""D8 flow direction (operators/focal.py::flow_direction): planar ramp
closed forms in all axis directions incl. tile seams, diagonal ramp,
tie-break determinism, pit/flat zero, nodata/border NULL."""

import numpy as np
import pytest

from spandex_spark.operators.focal import flow_direction

RES, NPX, NT = 1.0, 6, 2


def _tiles(spark, f):
    """f(lon, lat) -> z sampled at pixel centers over an NT x NT grid."""
    rows = []
    for ty in range(NT):
        for tx in range(NT):
            x0, y0 = tx * NPX * RES, ty * NPX * RES
            px = x0 + (np.arange(NPX) + 0.5) * RES
            py = y0 + (np.arange(NPX) + 0.5) * RES
            lon, lat = np.meshgrid(px, py)
            rows.append((ty * 10 + tx, x0, y0, RES, RES, NPX, NPX,
                         f(lon, lat).ravel().tolist()))
    return spark.createDataFrame(
        rows, "tile_id long, x0 double, y0 double, res double, res_y double,"
              " nx int, ny int, values array<double>")


def _full(df):
    full = np.full((NT * NPX, NT * NPX), np.nan)
    for r in df.collect():
        ty, tx = divmod(r["tile_id"], 10)
        full[ty*NPX:(ty+1)*NPX, tx*NPX:(tx+1)*NPX] = np.asarray(
            [np.nan if v is None else v for v in r["values"]]
        ).reshape(NPX, NPX)
    return full


@pytest.mark.parametrize("f,code", [
    (lambda lon, lat: lon, 16.0),          # rises east -> flows W
    (lambda lon, lat: -lon, 1.0),          # rises west -> flows E
    (lambda lon, lat: lat, 4.0),           # rises north -> flows S
    (lambda lon, lat: -lat, 64.0),         # rises south -> flows N
])
def test_axis_ramps_including_seams(spark, f, code):
    full = _full(flow_direction(_tiles(spark, f), origin_x=0, origin_y=0))
    inner = full[1:-1, 1:-1]
    assert np.all(inner == code)
    assert np.all(np.isnan(full[0, :]))     # border NULL


def test_diagonal_ramp(spark):
    # rises to the NE -> flows SW (code 8)
    full = _full(flow_direction(_tiles(spark, lambda lon, lat: lon + lat),
                                origin_x=0, origin_y=0))
    assert np.all(full[1:-1, 1:-1] == 8.0)


def test_tie_breaks_to_smallest_code(spark):
    # hand-built 3x3: center 5, its S (row 0) and W neighbours 4 (equal
    # drop 1.0), SW kept at 5 (drop 0) -> S (code 4) vs W (code 16)
    # tie must resolve to the smaller code, 4
    z = np.array([[5.0, 4.0, 5.0],
                  [4.0, 5.0, 5.0],
                  [5.0, 5.0, 5.0]])
    df = spark.createDataFrame(
        [(0, 0.0, 0.0, RES, RES, 3, 3, z.ravel().tolist())],
        "tile_id long, x0 double, y0 double, res double, res_y double,"
        " nx int, ny int, values array<double>")
    got = flow_direction(df, origin_x=0, origin_y=0).collect()[0]["values"]
    center = np.asarray([np.nan if v is None else v for v in got]
                        ).reshape(3, 3)[1, 1]
    assert center == 4.0


def test_pit_and_flat_zero(spark):
    full = _full(flow_direction(_tiles(spark, lambda lon, lat: lon * 0.0),
                                origin_x=0, origin_y=0))
    assert np.all(full[1:-1, 1:-1] == 0.0)  # flat
    # pit: a bowl's minimum has no positive drop
    cx = NT * NPX / 2.0
    full2 = _full(flow_direction(
        _tiles(spark, lambda lon, lat: (lon - cx) ** 2 + (lat - cx) ** 2),
        origin_x=0, origin_y=0))
    # the four center pixels are the bowl minimum region; at least the
    # global min pixel must be a pit (code 0)
    assert (full2[1:-1, 1:-1] == 0.0).sum() >= 1


def test_nodata_neighbour_nulls(spark):
    df = _tiles(spark, lambda lon, lat: lon)
    # poke one NULL into tile 0's interior
    from pyspark.sql import functions as F
    df = df.withColumn(
        "values",
        F.when(F.col("tile_id") == 0,
               F.transform("values", lambda v, i:
                           F.when(i == 14, F.lit(None)).otherwise(v)))
        .otherwise(F.col("values")))
    full = _full(flow_direction(df, origin_x=0, origin_y=0))
    # pixel 14 = (row 2, col 2): its 8 neighbours all NULL out
    assert np.isnan(full[1:4, 1:4]).all()
