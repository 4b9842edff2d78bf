"""Depression filling (`fill_sinks`) — the r.fill.dirs / GDAL
FillNodata / Wang–Liu step that precedes D8 analysis on real DEMs
(`focal.flow_direction` → `regions.watersheds`/`flow_accumulation`).

Semantics: the filled surface is the MINIMAX solution
``fill(c) = max(dem(c), min over all paths c→boundary of the maximum
elevation along the path)`` — water in a pit rises to its basin's
lowest spill point; sink-free DEMs are untouched (identity, pytested).
The raster edge and nodata cells are OPEN boundaries (they drain
freely, the priority-flood convention).

Distributed shape: the minimax fixpoint solves by BLOCK-JACOBI over
tiles — each round ships one-pixel fill strips to the 8 neighbors
(perimeter-sized exchange, the halo economics of focal.py), each tile
relaxes ``f ← max(dem, min₈(f))`` to LOCAL convergence with vectorized
numpy sweeps (Python cost = sweep count = longest in-tile drainage
chain, the flow_accumulation lesson), and the loop stops when NO
tile's fill moved — values start at +inf and decrease monotonically to
the unique fixpoint, and an all-tiles-unchanged round means the next
round's messages are identical, so the per-tile changed-flag probe is
an exact stop (a float-sum probe would be summation-order
nondeterministic and was avoided by design).  Rounds ≈ tile boundaries
crossed by the longest drainage path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spandex_spark.operators.focal import _tile_shape
from spandex_spark.operators.zonal import _with_res_y

__all__ = ["fill_sinks"]

_MSG = T.StructType([
    T.StructField("dtx", T.LongType()), T.StructField("dty", T.LongType()),
    T.StructField("sdx", T.IntegerType()), T.StructField("sdy", T.IntegerType()),
    T.StructField("payload", T.ArrayType(T.DoubleType())),
    T.StructField("tile_id", T.LongType()),
    T.StructField("x0", T.DoubleType()), T.StructField("y0", T.DoubleType()),
    T.StructField("dem", T.ArrayType(T.DoubleType())),
])


def _local_fill(dem: np.ndarray, pad_f: np.ndarray) -> np.ndarray:
    """Relax f = max(dem, min over 8 neighbours of f) to the local
    fixpoint with the padded border held fixed.  NaN in ``pad_f``'s
    ring or in dem = open boundary (−inf); returns the tile's new f
    (NaN where dem is nodata)."""
    ny, nx = dem.shape
    nodata = np.isnan(dem)
    ring = np.where(np.isnan(pad_f), -np.inf, pad_f)
    f = pad_f[1:-1, 1:-1].copy()
    f = np.where(np.isnan(f) | nodata, -np.inf, f)
    ring[1:-1, 1:-1] = f
    while True:
        ring[1:-1, 1:-1] = f
        nmin = np.minimum.reduce([
            ring[0:-2, 0:-2], ring[0:-2, 1:-1], ring[0:-2, 2:],
            ring[1:-1, 0:-2], ring[1:-1, 2:],
            ring[2:, 0:-2], ring[2:, 1:-1], ring[2:, 2:]])
        new = np.maximum(dem, nmin)
        new[nodata] = -np.inf
        if np.array_equal(new, f):
            break
        f = new
    f = f.astype(np.float64)
    f[nodata] = np.nan
    return f


def fill_sinks(dem_tiles: DataFrame, *, origin_x: float, origin_y: float,
               max_rounds: int = 200) -> DataFrame:
    """Filled-DEM tile table (same grid); nodata stays NULL."""
    tiles = _with_res_y(dem_tiles)
    res, res_y, nx, ny = _tile_shape(tiles)
    tw, th = res * nx, res_y * ny

    src = (tiles.select(
        "tile_id", "x0", "y0", F.col("values").alias("dem"),
        F.round((F.col("x0") - F.lit(origin_x)) / F.lit(tw))
        .cast("long").alias("tx"),
        F.round((F.col("y0") - F.lit(origin_y)) / F.lit(th))
        .cast("long").alias("ty"))
        .localCheckpoint(eager=True))

    state_schema = T.StructType([
        T.StructField("tile_id", T.LongType()),
        T.StructField("tx", T.LongType()), T.StructField("ty", T.LongType()),
        T.StructField("x0", T.DoubleType()), T.StructField("y0", T.DoubleType()),
        T.StructField("dem", T.ArrayType(T.DoubleType())),
        T.StructField("fill", T.ArrayType(T.DoubleType())),
        T.StructField("changed", T.BooleanType()),
    ])

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Each tile sends its fill border strips to the 8 neighbours
        and its own (dem, fill) to itself — focal.halo_exchange's
        message shape plus the dem payload."""
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                f = np.asarray([np.nan if v is None else v
                                for v in r.fill],
                               np.float64).reshape(ny, nx)
                tx, ty = int(r.tx), int(r.ty)
                rows.append((tx, ty, 0, 0, f.ravel().tolist(),
                             int(r.tile_id), float(r.x0), float(r.y0),
                             list(r.dem)))
                for sdx, sdy in ((-1, 0), (1, 0), (0, -1), (0, 1),
                                 (-1, -1), (1, -1), (-1, 1), (1, 1)):
                    cols = {-1: slice(0, 1), 0: slice(None),
                            1: slice(nx - 1, nx)}[-sdx]
                    rws = {-1: slice(0, 1), 0: slice(None),
                           1: slice(ny - 1, ny)}[-sdy]
                    rows.append((tx - sdx, ty - sdy, sdx, sdy,
                                 f[rws, cols].ravel().tolist(),
                                 None, None, None, None))
            yield pd.DataFrame(rows, columns=[f2.name
                                              for f2 in _MSG.fields])

    def assemble(key, pdf):
        me = pdf[pdf["tile_id"].notna()]
        if not len(me):
            return pd.DataFrame(columns=[f2.name
                                         for f2 in state_schema.fields])
        me = me.iloc[0]
        dem = np.asarray([np.nan if v is None else v for v in me["dem"]],
                         np.float64).reshape(ny, nx)
        pad = np.full((ny + 2, nx + 2), np.nan)
        for r in pdf.itertuples(index=False):
            sdx, sdy = int(r.sdx), int(r.sdy)
            if sdx == 0 and sdy == 0:
                pad[1:-1, 1:-1] = np.asarray(
                    r.payload, np.float64).reshape(ny, nx)
                continue
            cols = {-1: slice(0, 1), 0: slice(1, nx + 1),
                    1: slice(nx + 1, nx + 2)}[sdx]
            rws = {-1: slice(0, 1), 0: slice(1, ny + 1),
                   1: slice(ny + 1, ny + 2)}[sdy]
            w = 1 if sdx else nx
            h = 1 if sdy else ny
            pad[rws, cols] = np.asarray(
                r.payload, np.float64).reshape(h, w)
        f = _local_fill(dem, pad)
        old = pad[1:-1, 1:-1]
        changed = not np.array_equal(f, old, equal_nan=True)
        return pd.DataFrame([(int(me["tile_id"]), int(key[0]),
                              int(key[1]), float(me["x0"]),
                              float(me["y0"]),
                              me["dem"], f.ravel().tolist(),
                              bool(changed))],
                            columns=[f2.name
                                     for f2 in state_schema.fields])

    state = src.withColumn("fill", F.transform(
        "dem", lambda v: F.when(v.isNotNull(), F.lit(float("inf")))))
    for _ in range(max_rounds):
        state = (state.mapInPandas(emit, schema=_MSG)
                 .groupBy("dtx", "dty").applyInPandas(
                     assemble, state_schema)
                 .localCheckpoint(eager=True))
        # exact stop: if NO tile's fill moved given this round's
        # messages, next round's messages are identical — fixpoint
        # (values decrease monotonically from +inf, so this terminates)
        if state.filter("changed").limit(1).count() == 0:  # collect-ok: tile-changed emptiness probe (cost_distance precedent)
            vals = F.transform("fill", lambda v: F.when(~F.isnan(v), v))
            return state.select(
                "tile_id", "x0", "y0", F.lit(res).alias("res"),
                F.lit(res_y).alias("res_y"),
                F.lit(nx).alias("nx"), F.lit(ny).alias("ny"),
                vals.alias("values"))
    raise RuntimeError(
        f"fill_sinks did not converge within {max_rounds} rounds "
        "(a drainage path crosses more tile boundaries; raise it)")
