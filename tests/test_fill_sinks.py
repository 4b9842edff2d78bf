"""Depression filling (operators/hydrology.py::fill_sinks): identity on
sink-free DEMs, pit fills to spill level across tile seams, notch rim
closed form, nodata drains, hydrology end-to-end."""

import numpy as np
import pytest

from spandex_spark.operators.hydrology import fill_sinks

RES, NPX, NT = 1.0, 4, 2
N = NT * NPX


def _tiles(spark, dem):
    rows = []
    for ty in range(NT):
        for tx in range(NT):
            sub = dem[ty * NPX:(ty + 1) * NPX, tx * NPX:(tx + 1) * NPX]
            vals = [None if np.isnan(v) else float(v)
                    for v in sub.ravel()]
            rows.append((ty * 10 + tx, tx * NPX * RES, ty * NPX * RES,
                         RES, RES, NPX, NPX, vals))
    return spark.createDataFrame(
        rows, "tile_id long, x0 double, y0 double, res double,"
              " res_y double, nx int, ny int, values array<double>")


def _full(df):
    full = np.full((N, N), np.nan)
    for r in df.collect():
        ty, tx = divmod(r["tile_id"], 10)
        full[ty*NPX:(ty+1)*NPX, tx*NPX:(tx+1)*NPX] = np.asarray(
            [np.nan if v is None else v for v in r["values"]]
        ).reshape(NPX, NPX)
    return full


def test_sink_free_dem_is_identity(spark):
    x, y = np.meshgrid(np.arange(N, dtype=float),
                       np.arange(N, dtype=float))
    dem = 2.0 * x + 0.5 * y + 3.0  # tilted plane, drains everywhere
    out = _full(fill_sinks(_tiles(spark, dem), origin_x=0.0,
                           origin_y=0.0))
    assert np.array_equal(out, dem)


def test_pit_fills_to_flat_level_across_seams(spark):
    dem = np.full((N, N), 10.0)
    # a 2x2 pit straddling the vertical tile seam (cols 3..4)
    dem[3:5, 3:5] = 4.0
    out = _full(fill_sinks(_tiles(spark, dem), origin_x=0.0,
                           origin_y=0.0))
    assert np.all(out == 10.0)


def test_basin_fills_to_notch_spill(spark):
    # outside low (1), a rim of 8 with one notch at 5, basin floor 2:
    # the basin fills exactly to the notch elevation 5
    dem = np.ones((N, N))
    dem[2:7, 2:7] = 8.0      # rim block
    dem[3:6, 3:6] = 2.0      # basin interior
    dem[4, 2] = 5.0          # notch through the west rim
    out = _full(fill_sinks(_tiles(spark, dem), origin_x=0.0,
                           origin_y=0.0))
    assert np.all(out[3:6, 3:6] == 5.0)   # filled to spill
    assert out[4, 2] == 5.0               # notch untouched
    assert np.all(out[dem == 1.0] == 1.0)  # outside untouched
    rim = dem == 8.0
    assert np.all(out[rim] == 8.0)


def test_nodata_is_open_drain(spark):
    dem = np.full((N, N), 10.0)
    dem[3:5, 3:5] = 4.0        # would-be pit...
    dem[4, 5] = np.nan         # ...but adjacent nodata drains it
    out = _full(fill_sinks(_tiles(spark, dem), origin_x=0.0,
                           origin_y=0.0))
    assert np.isnan(out[4, 5])
    # the pit cells diagonal/adjacent to the nodata cell drain freely
    assert out[4, 4] == 4.0 and out[3, 4] == 4.0
    # pit cells NOT adjacent to nodata rise to their local spill (the
    # neighbouring pit cell that touches the drain), i.e. stay 4 too
    assert out[3, 3] == 4.0 and out[4, 3] == 4.0


def test_fill_then_flow_has_no_interior_pits(spark):
    from spandex_spark.operators.focal import flow_direction
    rng = np.random.default_rng(9)
    dem = (np.abs(np.arange(N) - N / 2.0)[None, :]
           + 0.1 * rng.uniform(size=(N, N)))  # noisy valley + pits
    dem[3, 3] -= 3.0
    dem[5, 6] -= 2.5
    filled = fill_sinks(_tiles(spark, dem), origin_x=0.0, origin_y=0.0)
    d8 = _full(flow_direction(filled, origin_x=0.0, origin_y=0.0))
    out = _full(fill_sinks(_tiles(spark, dem), origin_x=0.0,
                           origin_y=0.0))
    assert np.all(out >= dem - 1e-12)
    # interior pits (code 0 strictly below every neighbour) are gone;
    # FLATS can remain (code 0 with an equal neighbour) - standard
    for r in range(1, N - 1):
        for c in range(1, N - 1):
            if d8[r, c] == 0.0:
                nb = out[r-1:r+2, c-1:c+2]
                assert np.nanmin(nb) >= out[r, c] - 1e-12, (r, c)
                assert np.any(np.isclose(nb, out[r, c])), (r, c)
