"""Flow accumulation (operators/regions.py::flow_accumulation):
east-flow prefix closed form across tile seams, bowl sink totals,
nodata swallowing, cycle NULLs, end-to-end with flow_direction."""

import numpy as np
import pytest

from spandex_spark.operators.focal import flow_direction
from spandex_spark.operators.regions import flow_accumulation

RES, NPX, NT = 1.0, 4, 2


def _code_tiles(spark, codes):
    """codes: full (NT*NPX, NT*NPX) float array (np.nan = nodata)."""
    rows = []
    for ty in range(NT):
        for tx in range(NT):
            sub = codes[ty * NPX:(ty + 1) * NPX, tx * NPX:(tx + 1) * NPX]
            vals = [None if np.isnan(v) else float(v)
                    for v in sub.ravel()]
            rows.append((ty * 10 + tx, tx * NPX * RES, ty * NPX * RES,
                         RES, RES, NPX, NPX, vals))
    return spark.createDataFrame(
        rows, "tile_id long, x0 double, y0 double, res double,"
              " res_y double, nx int, ny int, values array<double>")


def _full(df):
    full = np.full((NT * NPX, NT * NPX), np.nan)
    for r in df.collect():
        ty, tx = divmod(r["tile_id"], 10)
        full[ty*NPX:(ty+1)*NPX, tx*NPX:(tx+1)*NPX] = np.asarray(
            [np.nan if v is None else v for v in r["values"]]
        ).reshape(NPX, NPX)
    return full


def test_east_flow_prefix_counts_across_seams(spark):
    codes = np.full((NT * NPX, NT * NPX), 1.0)  # 1 = east
    out = flow_accumulation(_code_tiles(spark, codes),
                            origin_x=0.0, origin_y=0.0)
    acc = _full(out)
    for r in range(NT * NPX):
        for c in range(NT * NPX):
            assert acc[r, c] == c + 1, (r, c)  # prefix count, incl. self


def test_bowl_sink_collects_everything(spark):
    # every cell flows straight toward the center column, the center
    # column flows south to a sink at the bottom-center
    n = NT * NPX
    codes = np.zeros((n, n))
    cx = n // 2
    for r in range(n):
        for c in range(n):
            if c < cx:
                codes[r, c] = 1.0       # east
            elif c > cx:
                codes[r, c] = 16.0      # west
            elif r > 0:
                codes[r, c] = 4.0       # south (row-1)
            else:
                codes[r, c] = 0.0       # sink
    out = flow_accumulation(_code_tiles(spark, codes),
                            origin_x=0.0, origin_y=0.0)
    acc = _full(out)
    assert acc[0, cx] == n * n          # the sink drains every cell
    assert acc[n - 1, 0] == 1.0         # a ridge corner counts itself


def test_nodata_swallows_and_stays_null(spark):
    codes = np.full((NT * NPX, NT * NPX), 1.0)
    codes[3, 5] = np.nan                # hole mid-row
    out = flow_accumulation(_code_tiles(spark, codes),
                            origin_x=0.0, origin_y=0.0)
    acc = _full(out)
    assert np.isnan(acc[3, 5])
    assert acc[3, 4] == 5.0             # counts up to the hole
    assert acc[3, 6] == 1.0             # restarts after the hole
    assert acc[2, 7] == 8.0             # other rows unaffected


def test_cycle_cells_null(spark):
    codes = np.zeros((NT * NPX, NT * NPX))
    codes[1, 1], codes[1, 2] = 1.0, 16.0   # two cells pointing at each other
    out = flow_accumulation(_code_tiles(spark, codes),
                            origin_x=0.0, origin_y=0.0)
    acc = _full(out)
    assert np.isnan(acc[1, 1]) and np.isnan(acc[1, 2])
    assert acc[0, 0] == 1.0                # sinks elsewhere unaffected


def test_end_to_end_with_flow_direction(spark):
    # a west-rising ramp: everything flows east; accumulation must be
    # the east prefix count on flow_direction's own output (border
    # pixels are NULL there - the interior check region)
    rows = []
    for ty in range(NT):
        for tx in range(NT):
            x0, y0 = tx * NPX * RES, ty * NPX * RES
            px = x0 + (np.arange(NPX) + 0.5) * RES
            lon, _ = np.meshgrid(px, px)
            rows.append((ty * 10 + tx, x0, y0, RES, RES, NPX, NPX,
                         (-lon).ravel().tolist()))
    dem = spark.createDataFrame(
        rows, "tile_id long, x0 double, y0 double, res double,"
              " res_y double, nx int, ny int, values array<double>")
    d8 = flow_direction(dem, origin_x=0.0, origin_y=0.0)
    acc = _full(flow_accumulation(d8, origin_x=0.0, origin_y=0.0))
    n = NT * NPX
    for r in range(1, n - 1):
        for c in range(1, n - 1):
            assert acc[r, c] == c, (r, c)   # col index = prefix after
            # the NULL border column swallowed nothing (starts at c=1)


def test_incremental_equals_full(spark):
    # incremental change-detection rounds are result-identical
    n = NT * NPX
    codes = np.full((n, n), 1.0)
    codes[2, 3] = 0.0            # a sink mid-stream
    codes[5, 1] = np.nan         # nodata
    tiles = _code_tiles(spark, codes)
    a = _full(flow_accumulation(tiles, origin_x=0.0, origin_y=0.0,
                                incremental=False))
    b = _full(flow_accumulation(tiles, origin_x=0.0, origin_y=0.0,
                                incremental=True))
    assert np.array_equal(a, b, equal_nan=True)
