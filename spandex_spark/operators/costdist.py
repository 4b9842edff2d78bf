"""Distributed cost-distance — the GRASS r.cost / ArcGIS CostDistance
analog: least accumulated traversal cost from source points over a
tiled cost raster, 8-connected moves.

Semantics (GRASS r.cost, "knight's move" off): moving between adjacent
pixels a -> b costs ``(cost_a + cost_b)/2 * step`` where step is the
center distance (res horizontally, res_y vertically, hypot(res,res_y)
diagonally).  NULL/NaN and NEGATIVE cost pixels are BARRIERS (no path
through, no output value — a negative traversal cost is a negative
cycle, diverging by construction; r.cost requires non-negative costs
too); pixels unreachable from any source stay NULL.

Distributed shape — the iterative halo exchange (the parallel
shortest-path literature's delta-stepping-on-blocks, specialized to
grids; same tile messaging as operators/focal.py, repeated to a fixed
point):

1. setup (one exchange): every tile acquires a 1-pixel COST halo from
   its 8 neighbours — static for the whole run — and seeds dist = 0
   at its source pixels;
2. each round, tiles exchange 1-pixel DIST border strips (perimeter-
   sized messages), then re-solve LOCALLY: vectorized Bellman-Ford
   over the padded array (8 shifted-array relaxations per pass, ring
   pixels fixed) until the tile is internally exact.  A tile whose
   incoming ring offers no improvement skips its sweep entirely —
   after the wavefront passes, steady-state tiles cost one array
   comparison per round;
3. a 1-row convergence probe (max improvement) ends the loop; rounds
   are bounded by the tile-graph diameter of the optimal path forest,
   NOT pixel count — the per-tile solver collapses all intra-tile
   propagation into one round.  Each round's state localCheckpoints
   (eager) like dedup.duplicate_clusters: iterative lineage must be
   truncated or round N replans rounds 1..N-1.

Output: _OUT_SCHEMA tiles (focal.py convention) whose ``values`` hold
accumulated cost; NULL = barrier or unreachable.

Scale: state per tile = pixels + one padded cost copy; messages are
perimeter-sized; the wavefront sweeps the tile graph once, so total
work ~ O(pixels x small constant) and the convergent steady state
costs one no-op round.  Hot spots (many sources in one tile) don't
skew — per-tile work is pixel-bound regardless of seed count.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spandex_spark.operators.focal import _OUT_SCHEMA, _tile_shape
from spandex_spark.operators.zonal import _with_res_y

__all__ = ["cost_distance", "isochrones", "cost_path", "proximity"]

_STATE_SCHEMA = T.StructType([
    T.StructField("tx", T.LongType()),
    T.StructField("ty", T.LongType()),
    T.StructField("tile_id", T.LongType()),
    T.StructField("x0", T.DoubleType()),
    T.StructField("y0", T.DoubleType()),
    T.StructField("padcost", T.ArrayType(T.DoubleType())),
    T.StructField("dist", T.ArrayType(T.DoubleType())),
    T.StructField("improved", T.DoubleType()),
])

_MSG_SCHEMA = T.StructType([
    T.StructField("tx", T.LongType()),
    T.StructField("ty", T.LongType()),
    T.StructField("sdx", T.IntegerType()),
    T.StructField("sdy", T.IntegerType()),
    T.StructField("payload", T.ArrayType(T.DoubleType())),
    T.StructField("tile_id", T.LongType()),
    T.StructField("x0", T.DoubleType()),
    T.StructField("y0", T.DoubleType()),
    T.StructField("padcost", T.ArrayType(T.DoubleType())),
])

_EDGES = ((-1, 0), (1, 0), (0, -1), (0, 1),
          (-1, -1), (1, -1), (-1, 1), (1, 1))


def _solve_tile(pad_dist: np.ndarray, pad_cost: np.ndarray,
                res: float, res_y: float) -> np.ndarray:
    """Exact 8-connected shortest path on the padded arrays: Jacobi
    Bellman-Ford (8 shifted-array relaxations per pass) to the fixed
    point.  The ring rows/cols stay fixed (neighbour data); barriers
    (NaN or NEGATIVE cost — a negative traversal cost is a negative
    cycle and Bellman-Ford would diverge; GRASS r.cost likewise
    requires non-negative input) never update.  Returns the full
    padded dist array."""
    diag = math.hypot(res, res_y)
    steps = [(-1, 0, res_y), (1, 0, res_y), (0, -1, res), (0, 1, res),
             (-1, -1, diag), (1, -1, diag), (-1, 1, diag), (1, 1, diag)]
    ny2, nx2 = pad_dist.shape
    with np.errstate(invalid="ignore"):
        blocked = ~(pad_cost >= 0.0)          # NaN or negative
    d = np.where(blocked, np.inf, pad_dist)
    d[np.isnan(d)] = np.inf
    interior = np.zeros_like(d, bool)
    interior[1:-1, 1:-1] = ~blocked[1:-1, 1:-1]
    half = np.where(blocked, np.inf, pad_cost) * 0.5
    while True:
        best = d.copy()
        for dy, dx, ln in steps:
            src_d = np.full_like(d, np.inf)
            src_h = np.full_like(d, np.inf)
            ys = slice(max(0, dy), ny2 + min(0, dy))
            yd = slice(max(0, -dy), ny2 + min(0, -dy))
            xs = slice(max(0, dx), nx2 + min(0, dx))
            xd = slice(max(0, -dx), nx2 + min(0, -dx))
            src_d[yd, xd] = d[ys, xs]
            src_h[yd, xd] = half[ys, xs]
            cand = src_d + (src_h + half) * ln
            np.minimum(best, np.where(interior, cand, np.inf), out=best)
        if not (best < d).any():
            return d
        d = best


def cost_distance(cost_tiles: DataFrame, sources: DataFrame, *,
                  origin_x: float, origin_y: float,
                  lon_col: str = "lon", lat_col: str = "lat",
                  max_rounds: int = 256) -> DataFrame:
    """Accumulated least cost from `sources` points over the tiled
    cost raster (module docstring).  Returns _OUT_SCHEMA tiles."""
    tiles = _with_res_y(cost_tiles)
    res, res_y, nx, ny = _tile_shape(tiles)
    tw, th = res * nx, res_y * ny
    spark = cost_tiles.sparkSession

    # source pixels per tile (tiny: one row per source point)
    px = F.floor((F.col(lon_col) - F.lit(origin_x)) / F.lit(res))
    py = F.floor((F.col(lat_col) - F.lit(origin_y)) / F.lit(res_y))
    seeds = (sources.select(
        F.floor(px / F.lit(nx)).cast("long").alias("tx"),
        F.floor(py / F.lit(ny)).cast("long").alias("ty"),
        (F.pmod(py, F.lit(ny)) * F.lit(nx) + F.pmod(px, F.lit(nx)))
        .cast("long").alias("pix"))
        .groupBy("tx", "ty").agg(F.collect_set("pix").alias("seedpix")))

    src = tiles.select(
        "tile_id", "x0", "y0", "values",
        F.round((F.col("x0") - F.lit(origin_x)) / F.lit(tw))
        .cast("long").alias("tx"),
        F.round((F.col("y0") - F.lit(origin_y)) / F.lit(th))
        .cast("long").alias("ty")).join(seeds, ["tx", "ty"], "left")

    # ---- setup exchange: build the static cost halo, seed dist ----
    def emit_cost(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                v = np.asarray(r.values, np.float64).reshape(ny, nx)
                tx, ty = int(r.tx), int(r.ty)
                seed_list = [] if r.seedpix is None else list(r.seedpix)
                rows.append((tx, ty, 0, 0, v.ravel().tolist(),
                             int(r.tile_id), float(r.x0), float(r.y0),
                             [float(s) for s in seed_list]))
                for sdx, sdy in _EDGES:
                    cols = {-1: slice(0, 1), 0: slice(None),
                            1: slice(nx - 1, nx)}[-sdx]
                    rws = {-1: slice(0, 1), 0: slice(None),
                           1: slice(ny - 1, ny)}[-sdy]
                    rows.append((tx - sdx, ty - sdy, sdx, sdy,
                                 v[rws, cols].ravel().tolist(),
                                 None, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in _MSG_SCHEMA])

    def assemble_cost(key, pdf: pd.DataFrame) -> pd.DataFrame:
        self_rows = pdf[pdf["tile_id"].notna()]
        if not len(self_rows):
            return pd.DataFrame(columns=[f.name for f in _STATE_SCHEMA])
        me = self_rows.iloc[0]
        pad = np.full((ny + 2, nx + 2), np.nan)
        seeds_pix = None
        for r in pdf.itertuples(index=False):
            sdx, sdy = int(r.sdx), int(r.sdy)
            if sdx == 0 and sdy == 0:
                pad[1:ny + 1, 1:nx + 1] = np.asarray(
                    r.payload, np.float64).reshape(ny, nx)
                seeds_pix = r.padcost          # seed list rode this slot
                continue
            cols = {-1: slice(0, 1), 0: slice(1, nx + 1),
                    1: slice(nx + 1, nx + 2)}[sdx]
            rws = {-1: slice(0, 1), 0: slice(1, ny + 1),
                   1: slice(ny + 1, ny + 2)}[sdy]
            w = 1 if sdx else nx
            h = 1 if sdy else ny
            pad[rws, cols] = np.asarray(r.payload,
                                        np.float64).reshape(h, w)
        dist = np.full((ny + 2, nx + 2), np.inf)
        if seeds_pix is not None:
            for s in seeds_pix:
                p = int(s)
                rr, cc = divmod(p, nx)
                if pad[rr + 1, cc + 1] >= 0:   # not barrier (NaN/neg)
                    dist[rr + 1, cc + 1] = 0.0
        solved = _solve_tile(dist, pad, res, res_y)
        inner = solved[1:ny + 1, 1:nx + 1]
        return pd.DataFrame([(int(key[0]), int(key[1]),
                              int(me["tile_id"]), float(me["x0"]),
                              float(me["y0"]), pad.ravel().tolist(),
                              inner.ravel().tolist(),
                              1.0 if np.isfinite(inner).any() else 0.0)],
                            columns=[f.name for f in _STATE_SCHEMA])

    state = (src.mapInPandas(emit_cost, schema=_MSG_SCHEMA)
             .groupBy("tx", "ty").applyInPandas(assemble_cost,
                                                _STATE_SCHEMA)
             .localCheckpoint(eager=True))

    # ---- iterate: exchange dist strips, re-solve where improvable ----
    def emit_dist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                d = np.asarray(r.dist, np.float64).reshape(ny, nx)
                tx, ty = int(r.tx), int(r.ty)
                rows.append((tx, ty, 0, 0, r.dist,
                             int(r.tile_id), float(r.x0), float(r.y0),
                             r.padcost))
                for sdx, sdy in _EDGES:
                    cols = {-1: slice(0, 1), 0: slice(None),
                            1: slice(nx - 1, nx)}[-sdx]
                    rws = {-1: slice(0, 1), 0: slice(None),
                           1: slice(ny - 1, ny)}[-sdy]
                    strip = d[rws, cols]
                    if np.isfinite(strip).any():
                        rows.append((tx - sdx, ty - sdy, sdx, sdy,
                                     strip.ravel().tolist(),
                                     None, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in _MSG_SCHEMA])

    def assemble_dist(key, pdf: pd.DataFrame) -> pd.DataFrame:
        self_rows = pdf[pdf["tile_id"].notna()]
        if not len(self_rows):
            return pd.DataFrame(columns=[f.name for f in _STATE_SCHEMA])
        me = self_rows.iloc[0]
        pad_cost = np.asarray(me["padcost"],
                              np.float64).reshape(ny + 2, nx + 2)
        cur = np.asarray(me["payload"], np.float64).reshape(ny, nx)
        pad = np.full((ny + 2, nx + 2), np.inf)
        pad[1:ny + 1, 1:nx + 1] = cur
        got_ring = False
        for r in pdf.itertuples(index=False):
            sdx, sdy = int(r.sdx), int(r.sdy)
            if sdx == 0 and sdy == 0:
                continue
            cols = {-1: slice(0, 1), 0: slice(1, nx + 1),
                    1: slice(nx + 1, nx + 2)}[sdx]
            rws = {-1: slice(0, 1), 0: slice(1, ny + 1),
                   1: slice(ny + 1, ny + 2)}[sdy]
            w = 1 if sdx else nx
            h = 1 if sdy else ny
            pad[rws, cols] = np.minimum(
                pad[rws, cols],
                np.asarray(r.payload, np.float64).reshape(h, w))
            got_ring = True
        improved = 0.0
        if got_ring:
            solved = _solve_tile(pad, pad_cost, res, res_y)
            new = solved[1:ny + 1, 1:nx + 1]
            delta = np.where(np.isfinite(cur) | np.isfinite(new),
                             cur - new, 0.0)
            delta = np.where(np.isnan(delta), np.inf, delta)  # inf -> finite
            imp = float(np.nanmax(delta)) if delta.size else 0.0
            if imp > 0:
                improved = imp if np.isfinite(imp) else 1.0
                cur = new
        return pd.DataFrame([(int(key[0]), int(key[1]),
                              int(me["tile_id"]), float(me["x0"]),
                              float(me["y0"]), me["padcost"],
                              cur.ravel().tolist(), improved)],
                            columns=[f.name for f in _STATE_SCHEMA])

    for _ in range(max_rounds):
        if state.agg(F.max("improved")).collect()[0][0] <= 0.0:  # collect-ok: 1-row convergence probe (dedup.duplicate_clusters precedent)
            break
        state = (state.mapInPandas(emit_dist, schema=_MSG_SCHEMA)
                 .groupBy("tx", "ty").applyInPandas(assemble_dist,
                                                    _STATE_SCHEMA)
                 .localCheckpoint(eager=True))
    else:
        raise RuntimeError(f"cost_distance did not converge within "
                           f"{max_rounds} rounds")

    # inf (unreachable) and NaN-cost barriers surface as NULL elements
    vals = F.transform(
        "dist", lambda v: F.when(v < F.lit(float("inf")), v))
    return (state.select(
        "tile_id", "x0", "y0", F.lit(res).alias("res"),
        F.lit(res_y).alias("res_y"), F.lit(nx).alias("nx"),
        F.lit(ny).alias("ny"), vals.alias("values"))
        .select([f.name for f in _OUT_SCHEMA.fields]))


def isochrones(cost_tiles: DataFrame, sources: DataFrame, *,
               origin_x: float, origin_y: float, levels,
               lon_col: str = "lon", lat_col: str = "lat",
               max_rounds: int = 256) -> DataFrame:
    """Iso-cost contour polylines ("drive-time rings"): cost_distance
    -> contour_lines -> assemble_contours, the classic isochrone
    composition (ArcGIS Cost Distance + Contour; OSRM/Valhalla
    isochrones are the network twin).  Returns assemble_contours
    output: one polyline per (value, line_id) at each cost level.
    Unreachable/barrier pixels are NULL in the cost surface and the
    marching-squares kernel treats them as missing — contours stop at
    the reachability frontier rather than fabricating a boundary."""
    from spandex_spark.operators.contour import (assemble_contours,
                                                 contour_lines)
    dist = cost_distance(cost_tiles, sources, origin_x=origin_x,
                         origin_y=origin_y, lon_col=lon_col,
                         lat_col=lat_col, max_rounds=max_rounds)
    segs = contour_lines(dist, levels=levels, origin_x=origin_x,
                         origin_y=origin_y)
    return assemble_contours(segs)


_PATH_SCHEMA = T.StructType([
    T.StructField("dest_id", T.StringType()),
    T.StructField("kind", T.StringType()),      # 'path' | 'handoff'
    T.StructField("seq", T.LongType()),
    T.StructField("gx", T.LongType()),
    T.StructField("gy", T.LongType()),
    T.StructField("cost", T.DoubleType()),
])

_WALKER_SCHEMA = T.StructType([
    T.StructField("dest_id", T.StringType()),
    T.StructField("tx", T.LongType()),
    T.StructField("ty", T.LongType()),
    T.StructField("pr", T.IntegerType()),
    T.StructField("pc", T.IntegerType()),
    T.StructField("seq0", T.LongType()),
])


def cost_path(dist_tiles: DataFrame, destinations: DataFrame, *,
              origin_x: float, origin_y: float, dest_id_col: str,
              lon_col: str = "lon", lat_col: str = "lat",
              max_rounds: int = 1024) -> DataFrame:
    """Least-cost path backtrace (GRASS r.drain / ArcGIS CostPath):
    from each destination point, walk steepest ACCUMULATED-cost
    descent over a `cost_distance` surface down to a source (cost 0).

    Distributed shape: the padded dist surface is built ONCE (one halo
    exchange, checkpointed — it is static); each round joins the
    walker set (destination-sized, broadcast) to its tiles and walks
    IN-TILE until the next step leaves the tile, emitting path pixels
    and a handoff walker; rounds = tile crossings of the longest path,
    not pixel count.  Ties in the descent break by fixed neighbor
    order (N, S, W, E, NW, SW, NE, SE on the row-0-at-bottom grid) —
    fully deterministic.  A plateau (no strictly smaller neighbor,
    cost > 0 — only possible with zero-cost regions) ends the walk
    where it stands, documented like GRASS's flat handling.

    Output: (dest_id [string], seq [0 = the destination], gx, gy
    [global pixel indices], lon, lat [pixel centers], cost).
    Destinations on NULL (barrier/unreachable) pixels emit nothing.
    """
    tiles = _with_res_y(dist_tiles)
    res, res_y, nx, ny = _tile_shape(tiles)
    tw, th = res * nx, res_y * ny

    # static padded-dist state, one exchange (focal.halo_exchange
    # carries a single values channel, which is all we need here)
    from spandex_spark.operators.focal import halo_exchange
    pad_schema = T.StructType([
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("paddist", T.ArrayType(T.DoubleType())),
    ])

    def keep_pad(pad, meta):
        tx = int(round((meta["x0"] - origin_x) / tw))
        ty = int(round((meta["y0"] - origin_y) / th))
        return [(tx, ty, [None if math.isnan(v) else float(v)
                          for v in pad.ravel()])]

    state = halo_exchange(tiles, origin_x=origin_x, origin_y=origin_y,
                          per_tile=keep_pad, out_schema=pad_schema) \
        .localCheckpoint(eager=True)

    px = F.floor((F.col(lon_col) - F.lit(origin_x)) / F.lit(res))
    py = F.floor((F.col(lat_col) - F.lit(origin_y)) / F.lit(res_y))
    walkers = destinations.select(
        F.col(dest_id_col).cast("string").alias("dest_id"),
        F.floor(px / F.lit(nx)).cast("long").alias("tx"),
        F.floor(py / F.lit(ny)).cast("long").alias("ty"),
        F.pmod(py, F.lit(ny)).cast("int").alias("pr"),
        F.pmod(px, F.lit(nx)).cast("int").alias("pc"),
        F.lit(0).cast("long").alias("seq0"))

    # fixed deterministic descent order (dy, dx)
    nbrs = ((1, 0), (-1, 0), (0, -1), (0, 1),
            (1, -1), (-1, -1), (1, 1), (-1, 1))

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pad = np.asarray(
                    [np.nan if v is None else v for v in r.paddist],
                    np.float64).reshape(ny + 2, nx + 2)
                tx, ty = int(r.tx), int(r.ty)
                rr, cc = int(r.pr) + 1, int(r.pc) + 1   # padded coords
                seq = int(r.seq0)
                d = pad[rr, cc]
                if np.isnan(d):
                    continue                             # unreachable dest
                while True:
                    gx = tx * nx + cc - 1
                    gy = ty * ny + rr - 1
                    rows.append((r.dest_id, "path", seq, gx, gy,
                                 float(d)))
                    if d <= 0.0:
                        break
                    bd, brc = d, None
                    for dy, dx in nbrs:
                        nd = pad[rr + dy, cc + dx]
                        if not np.isnan(nd) and nd < bd:
                            bd, brc = nd, (rr + dy, cc + dx)
                    if brc is None:
                        break                            # plateau stop
                    rr, cc = brc
                    d = bd
                    seq += 1
                    if not (1 <= rr <= ny and 1 <= cc <= nx):
                        # stepped into the ring: hand off to the owner
                        gx = tx * nx + cc - 1
                        gy = ty * ny + rr - 1
                        rows.append((r.dest_id, "handoff", seq,
                                     gx, gy, float(d)))
                        break
            yield pd.DataFrame(rows,
                               columns=[f.name for f in _PATH_SCHEMA])

    spark = dist_tiles.sparkSession
    segments = []
    for _ in range(max_rounds):
        if walkers.limit(1).count() == 0:  # collect-ok: walker-emptiness probe (destination-sized state)
            break
        joined = state.join(F.broadcast(walkers), ["tx", "ty"])
        out = joined.mapInPandas(walk, schema=_PATH_SCHEMA) \
            .localCheckpoint(eager=True)
        segments.append(out.filter(F.col("kind") == "path"))
        walkers = (out.filter(F.col("kind") == "handoff")
                   .select("dest_id",
                           F.floor(F.col("gx") / F.lit(nx)).alias("tx"),
                           F.floor(F.col("gy") / F.lit(ny)).alias("ty"),
                           F.pmod(F.col("gy"), F.lit(ny)).cast("int")
                           .alias("pr"),
                           F.pmod(F.col("gx"), F.lit(nx)).cast("int")
                           .alias("pc"),
                           F.col("seq").alias("seq0")))
    else:
        raise RuntimeError(f"cost_path did not finish within "
                           f"{max_rounds} rounds")

    if not segments:
        return spark.createDataFrame([], _PATH_SCHEMA) \
            .select("dest_id", "seq", "gx", "gy",
                    F.lit(None).cast("double").alias("lon"),
                    F.lit(None).cast("double").alias("lat"), "cost")
    path = segments[0]
    for s in segments[1:]:
        path = path.unionByName(s)
    lon = F.lit(origin_x) + (F.col("gx") + F.lit(0.5)) * F.lit(res)
    lat = F.lit(origin_y) + (F.col("gy") + F.lit(0.5)) * F.lit(res_y)
    return path.select("dest_id", "seq", "gx", "gy",
                       lon.alias("lon"), lat.alias("lat"), "cost")


def proximity(tiles: DataFrame, *, origin_x: float, origin_y: float,
              target_value: float | None = None,
              max_rounds: int = 256) -> DataFrame:
    """Proximity raster (gdal_proximity analog): distance from every
    pixel to the nearest TARGET pixel — targets are pixels equal to
    ``target_value`` (NaN-safe equality) or, when None, all non-NULL
    pixels.  Pure composition: targets become cost-distance sources
    over a uniform unit-cost surface, so the output is the 8-connected
    CHAMFER distance (res/res_y/diagonal steps), which overestimates
    true Euclidean by at most ~8% on diagonals (sqrt(2)/(1+sqrt(2))/2
    geometry; gdal_proximity computes exact Euclidean — documented
    difference, same role).  Output: _OUT_SCHEMA tiles of distances in
    map units; target pixels are 0."""
    tiles = _with_res_y(tiles)
    res, res_y, nx, ny = _tile_shape(tiles)
    # source points = centers of target pixels (sparse relative to the
    # raster in the proximity use case)
    pred = ("v is not null" if target_value is None
            else f"v = {float(target_value)!r}")
    idx = F.expr(f"filter(transform(values, (v, i) -> "
                 f"IF({pred}, i, -1)), i -> i >= 0)")
    srcs = (tiles.select("x0", "y0", F.explode(idx).alias("i"))
            .select(
        (F.col("x0") + ((F.col("i") % nx) + F.lit(0.5)) * F.lit(res))
        .alias("lon"),
        (F.col("y0") + (F.floor(F.col("i") / nx) + F.lit(0.5))
         * F.lit(res_y)).alias("lat")))
    unit = tiles.withColumn(
        "values", F.transform("values", lambda v: F.lit(1.0)))
    return cost_distance(unit, srcs, origin_x=origin_x,
                         origin_y=origin_y, max_rounds=max_rounds)
