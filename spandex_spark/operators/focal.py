"""Focal (neighborhood) raster ops: slope / aspect / hillshade — the
`gdaldem` analog, Horn's (1981) 3x3 finite-difference kernel.

Reference semantics: spandex's rastertoolz reads DEMs through PostGIS
raster SQL, where terrain derivatives are ST_Slope/ST_Aspect/
ST_HillShade (SURVEY.md §2 O7). Those are FOCAL ops — each output
pixel needs its 8 neighbours — which on a tiled distributed raster
means pixels on tile edges need data from adjacent tiles.

Distributed shape — the halo exchange, ONE shuffle total:

* tiles key themselves on integer grid indices (tx, ty) derived from a
  REGULAR tiling (uniform res/nx/ny anchored at an origin — the same
  probe + contract as `zonal.raster_sample`);
* every tile emits 9 messages: itself (full pixel array) to its own
  key, and 1-pixel-wide edge strips / corner pixels to each of its 8
  neighbours' keys — the strips are perimeter-sized, so the exchange
  carries ~(1 + 4/nx) times the raster, not 9x;
* one `groupBy(tx, ty).applyInPandas` assembles the (ny+2)x(nx+2)
  padded array and runs the Horn kernel vectorized. Strips addressed
  to tiles that don't exist die in the shuffle (their group has no
  self-message and emits nothing).

Pixels whose 3x3 window is incomplete — the outer border of the whole
raster, or next to a NULL/NaN pixel — come out NULL (gdaldem's
default no -compute_edges behaviour), written as NULL array elements
per the engine tile-table convention.

Units: gradients are z-units per map unit. For lon/lat rasters with
z in meters pass ``scale≈111320`` (meters per degree, the gdaldem -s
flag); ``z_factor`` is the vertical exaggeration. Aspect is the
compass bearing of the DOWNSLOPE direction, degrees clockwise from
north (+y), NULL on flat cells. Hillshade is
``255·max(0, cos(zenith)cos(slope) + sin(zenith)sin(slope)cos(azimuth−aspect))``
rounded to an integer 0-255, NULL only where the window is incomplete
(flat cells get the full ``255·cos(zenith)``).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spandex_spark.operators.zonal import _with_res_y

_MSG_SCHEMA = T.StructType([
    T.StructField("tx", T.LongType()),
    T.StructField("ty", T.LongType()),
    T.StructField("sdx", T.IntegerType()),   # sender pos relative to dest
    T.StructField("sdy", T.IntegerType()),
    T.StructField("payload", T.ArrayType(T.DoubleType())),
    T.StructField("tile_id", T.LongType()),  # self-message only
    T.StructField("x0", T.DoubleType()),
    T.StructField("y0", T.DoubleType()),
])

_OUT_FIELDS = ["tile_id", "x0", "y0", "res", "res_y", "nx", "ny", "values"]
_OUT_SCHEMA = T.StructType([
    T.StructField("tile_id", T.LongType()),
    T.StructField("x0", T.DoubleType()),
    T.StructField("y0", T.DoubleType()),
    T.StructField("res", T.DoubleType()),
    T.StructField("res_y", T.DoubleType()),
    T.StructField("nx", T.IntegerType()),
    T.StructField("ny", T.IntegerType()),
    T.StructField("values", T.ArrayType(T.DoubleType())),
])


def _tile_shape(tiles: DataFrame):
    shapes = (tiles.select("res", "res_y", "nx", "ny")
              .distinct().limit(2).collect())  # collect-ok: <=2-row tile-shape probe (regular-tiling check)
    if not shapes:
        raise ValueError("focal: empty tile table")
    if len(shapes) > 1:
        raise ValueError(
            "focal ops require a regular tiling (uniform res/nx/ny); "
            f"found at least {shapes[0]} and {shapes[1]}")
    s = shapes[0]
    return float(s["res"]), float(s["res_y"]), int(s["nx"]), int(s["ny"])


def halo_exchange(tiles: DataFrame, *, origin_x: float, origin_y: float,
                  per_tile, out_schema: T.StructType,
                  halo: int = 1) -> DataFrame:
    """The generic ONE-shuffle tile halo exchange (module docstring):
    ``per_tile(padded, meta) -> list[tuple]`` runs once per tile on the
    assembled (ny+2·halo)x(nx+2·halo) padded array (NaN where no
    neighbour exists); ``meta`` is a dict with
    tile_id/x0/y0/res/res_y/nx/ny. Rows it returns become
    ``out_schema`` rows. `operators/contour.py` builds on this with a
    non-tile output shape; `focal_stats` passes ``halo > 1`` for wider
    windows (strips stay perimeter-sized: the exchange carries
    ~(1 + 4·halo/nx)× the raster). ``halo`` must not exceed the tile
    dims — wider windows would need neighbour-of-neighbour data, i.e.
    a second exchange; retile first instead."""
    tiles = _with_res_y(tiles)
    res, res_y, nx, ny = _tile_shape(tiles)
    if not (1 <= halo <= min(nx, ny)):
        raise ValueError(f"halo must be in [1, min(nx, ny)={min(nx, ny)}]")
    tw, th = res * nx, res_y * ny

    src = tiles.select(
        "tile_id", "x0", "y0", "values",
        F.round((F.col("x0") - F.lit(origin_x)) / F.lit(tw))
        .cast("long").alias("tx"),
        F.round((F.col("y0") - F.lit(origin_y)) / F.lit(th))
        .cast("long").alias("ty"))

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                v = np.asarray(r.values, np.float64).reshape(ny, nx)
                tx, ty = int(r.tx), int(r.ty)
                rows.append((tx, ty, 0, 0, v.ravel().tolist(),
                             int(r.tile_id), float(r.x0), float(r.y0)))
                # edge strips: sdx/sdy = MY position relative to the dest
                for sdx, sdy in ((-1, 0), (1, 0), (0, -1), (0, 1),
                                 (-1, -1), (1, -1), (-1, 1), (1, 1)):
                    # dest = me - (sdx, sdy); the strip is my side facing it
                    cols = {-1: slice(0, halo), 0: slice(None),
                            1: slice(nx - halo, nx)}[-sdx]
                    rws = {-1: slice(0, halo), 0: slice(None),
                           1: slice(ny - halo, ny)}[-sdy]
                    rows.append((tx - sdx, ty - sdy, sdx, sdy,
                                 v[rws, cols].ravel().tolist(),
                                 None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in _MSG_SCHEMA])

    msgs = src.mapInPandas(emit, schema=_MSG_SCHEMA)

    out_fields = [f.name for f in out_schema.fields]

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        self_rows = pdf[pdf["tile_id"].notna()]
        if not len(self_rows):
            return pd.DataFrame(columns=out_fields)
        me = self_rows.iloc[0]
        pad = np.full((ny + 2 * halo, nx + 2 * halo), np.nan)
        for r in pdf.itertuples(index=False):
            sdx, sdy = int(r.sdx), int(r.sdy)
            if sdx == 0 and sdy == 0:
                pad[halo:ny + halo, halo:nx + halo] = np.asarray(
                    r.payload, np.float64).reshape(ny, nx)
                continue
            # sender at (sdx, sdy) fills the matching padded border
            cols = {-1: slice(0, halo), 0: slice(halo, nx + halo),
                    1: slice(nx + halo, nx + 2 * halo)}[sdx]
            rws = {-1: slice(0, halo), 0: slice(halo, ny + halo),
                   1: slice(ny + halo, ny + 2 * halo)}[sdy]
            w = (halo if sdx else nx)
            h = (halo if sdy else ny)
            pad[rws, cols] = np.asarray(
                r.payload, np.float64).reshape(h, w)
        meta = {"tile_id": int(me["tile_id"]), "x0": float(me["x0"]),
                "y0": float(me["y0"]), "res": res, "res_y": res_y,
                "nx": nx, "ny": ny}
        return pd.DataFrame(per_tile(pad, meta), columns=out_fields)

    return msgs.groupBy("tx", "ty").applyInPandas(assemble, out_schema)


def _focal(tiles: DataFrame, *, origin_x: float, origin_y: float,
           kernel) -> DataFrame:
    """Tile-out halo op: ``kernel(padded, res, res_y) -> 2D float array
    (NaN = NULL out)`` applied per tile."""
    def per_tile(pad, meta):
        out = np.asarray(kernel(pad, meta["res"], meta["res_y"]),
                         np.float64)
        # Horn's kernel omits the center pixel, but nodata-in means
        # nodata-out (gdaldem convention)
        out[np.isnan(pad[1:-1, 1:-1])] = np.nan
        vals = [None if math.isnan(x) else float(x) for x in out.ravel()]
        return [(meta["tile_id"], meta["x0"], meta["y0"], meta["res"],
                 meta["res_y"], meta["nx"], meta["ny"], vals)]
    return halo_exchange(tiles, origin_x=origin_x, origin_y=origin_y,
                         per_tile=per_tile, out_schema=_OUT_SCHEMA)


def _horn_gradients(pad: np.ndarray, resx: float, resy: float):
    """Horn 3x3 gradients (z per map unit) for the interior; NaN where
    the window is incomplete. pad is (ny+2, nx+2)."""
    e = pad[1:-1, 2:]
    w = pad[1:-1, :-2]
    n = pad[2:, 1:-1]
    s = pad[:-2, 1:-1]
    ne, nw = pad[2:, 2:], pad[2:, :-2]
    se, sw = pad[:-2, 2:], pad[:-2, :-2]
    gx = ((ne + 2 * e + se) - (nw + 2 * w + sw)) / (8.0 * resx)
    gy = ((ne + 2 * n + nw) - (se + 2 * s + sw)) / (8.0 * resy)
    return gx, gy  # NaN propagates from any missing neighbour


def slope(tiles: DataFrame, *, origin_x: float, origin_y: float,
          scale: float = 1.0, z_factor: float = 1.0) -> DataFrame:
    """Slope in degrees (gdaldem slope / ST_Slope analog)."""
    def k(pad, rx, ry):
        gx, gy = _horn_gradients(pad, rx * scale, ry * scale)
        return np.degrees(np.arctan(z_factor * np.hypot(gx, gy)))
    return _focal(tiles, origin_x=origin_x, origin_y=origin_y, kernel=k)


def aspect(tiles: DataFrame, *, origin_x: float,
           origin_y: float) -> DataFrame:
    """Downslope compass bearing, degrees clockwise from north (+y);
    NULL on flat cells (gdaldem aspect / ST_Aspect analog)."""
    def k(pad, rx, ry):
        gx, gy = _horn_gradients(pad, rx, ry)
        out = np.mod(np.degrees(np.arctan2(-gx, -gy)), 360.0)
        out[(gx == 0) & (gy == 0)] = np.nan  # flat
        return out
    return _focal(tiles, origin_x=origin_x, origin_y=origin_y, kernel=k)


def hillshade(tiles: DataFrame, *, origin_x: float, origin_y: float,
              azimuth_deg: float = 315.0, altitude_deg: float = 45.0,
              scale: float = 1.0, z_factor: float = 1.0) -> DataFrame:
    """Shaded relief 0-255 (gdaldem hillshade / ST_HillShade analog)."""
    zen = math.radians(90.0 - altitude_deg)
    az = math.radians(azimuth_deg)

    def k(pad, rx, ry):
        gx, gy = _horn_gradients(pad, rx * scale, ry * scale)
        sl = np.arctan(z_factor * np.hypot(gx, gy))
        asp = np.arctan2(-gx, -gy)  # bearing from north, radians
        v = (np.cos(zen) * np.cos(sl)
             + np.sin(zen) * np.sin(sl) * np.cos(az - asp))
        return np.round(255.0 * np.clip(v, 0.0, 1.0))
    return _focal(tiles, origin_x=origin_x, origin_y=origin_y, kernel=k)


_FOCAL_STATS = ("mean", "sum", "min", "max", "std", "median",
                "range", "count")


def focal_stats(tiles: DataFrame, *, origin_x: float, origin_y: float,
                stat: str = "mean", window: int = 3) -> DataFrame:
    """Focal statistics (the ArcGIS FocalStatistics / GRASS r.neighbors
    analog): per-pixel ``stat`` over the odd ``window``×``window``
    neighbourhood, distributed on the same ONE-shuffle halo exchange
    with halo = window//2.

    Nodata semantics — DELIBERATELY the FocalStatistics convention, not
    the slope/aspect null-out: NaN cells (nodata neighbours, and cells
    beyond the raster border) are IGNORED, so border pixels aggregate
    their partial window; output is NULL only when the whole window is
    empty. ``count`` returns the number of valid cells, ``range`` is
    max−min, ``std`` is population (ddof=0)."""
    if stat not in _FOCAL_STATS:
        raise ValueError(f"stat {stat!r} not in {_FOCAL_STATS}")
    if window < 3 or window % 2 == 0:
        raise ValueError("window must be odd and >= 3")
    h = window // 2

    def per_tile(pad, meta):
        sw = np.lib.stride_tricks.sliding_window_view(pad, (window, window))
        flat = sw.reshape(sw.shape[0], sw.shape[1], -1)
        cnt = (~np.isnan(flat)).sum(axis=2)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN slices
            if stat == "count":
                out = cnt.astype(np.float64)
            elif stat == "range":
                out = np.nanmax(flat, axis=2) - np.nanmin(flat, axis=2)
            else:
                out = getattr(np, f"nan{stat}")(flat, axis=2)
        out = np.where(cnt == 0, np.nan, out)
        vals = [None if math.isnan(x) else float(x) for x in out.ravel()]
        return [(meta["tile_id"], meta["x0"], meta["y0"], meta["res"],
                 meta["res_y"], meta["nx"], meta["ny"], vals)]

    return halo_exchange(tiles, origin_x=origin_x, origin_y=origin_y,
                         per_tile=per_tile, out_schema=_OUT_SCHEMA, halo=h)


# ESRI D8 codes by direction; our arrays are row-major with row 0 at
# the SOUTH edge (y grows with the row index), so "north" is row+1
_D8 = (
    (1,    0, +1, 1.0),     # E
    (2,   -1, +1, None),    # SE  (south = row-1)
    (4,   -1,  0, 1.0),     # S
    (8,   -1, -1, None),    # SW
    (16,   0, -1, 1.0),     # W
    (32,  +1, -1, None),    # NW
    (64,  +1,  0, 1.0),     # N
    (128, +1, +1, None),    # NE
)


def flow_direction(tiles: DataFrame, *, origin_x: float, origin_y: float,
                   scale: float = 1.0) -> DataFrame:
    """D8 flow direction (the gdaldem-family hydrology primitive; ESRI
    codes 1=E, 2=SE, 4=S, 8=SW, 16=W, 32=NW, 64=N, 128=NE): each pixel
    points at the steepest-DROP neighbour, drop = (z - z_n) / distance
    with diagonal distance sqrt(resx²+resy²). Ties break to the
    SMALLEST code (fixed E→NE scan — deterministic where ESRI inherits
    implementation order). Flats and pits (no positive drop) code 0;
    border/nodata-adjacent windows are NULL, the `slope` convention.
    Same ONE-shuffle halo exchange."""
    def k(pad, rx, ry):
        rx, ry = rx * scale, ry * scale
        diag = math.hypot(rx, ry)
        z = pad[1:-1, 1:-1]
        best_drop = np.full_like(z, 0.0)
        best_code = np.zeros_like(z)
        for code, dr, dc, _ in _D8:
            zn = pad[1 + dr:pad.shape[0] - 1 + dr,
                     1 + dc:pad.shape[1] - 1 + dc]
            dist = diag if (dr and dc) else (rx if dc else ry)
            drop = (z - zn) / dist
            better = drop > best_drop + 0.0   # strict: ties keep smaller code
            best_code = np.where(better, float(code), best_code)
            best_drop = np.where(better, drop, best_drop)
        # incomplete window -> NULL (any NaN neighbour poisons, like slope)
        window_nan = np.zeros(z.shape, bool)
        for code, dr, dc, _ in _D8:
            zn = pad[1 + dr:pad.shape[0] - 1 + dr,
                     1 + dc:pad.shape[1] - 1 + dc]
            window_nan |= np.isnan(zn)
        out = best_code.copy()
        out[window_nan] = np.nan
        return out
    return _focal(tiles, origin_x=origin_x, origin_y=origin_y, kernel=k)


def curvature(tiles: DataFrame, *, origin_x: float, origin_y: float,
              kind: str = "total") -> DataFrame:
    """Surface curvature (Zevenbergen & Thorne 1987 — the ArcGIS
    Curvature tool's quadric fit, raw units of 1/map-unit, NOT ArcGIS's
    x(-100) display scaling).  ``kind``: 'total' = -2(D+E) (convexity
    of the surface), 'profile' = curvature along the slope direction
    (acceleration of flow), 'plan' = curvature across it (flow
    convergence/divergence).  Flat cells (zero gradient) have
    undefined flow direction: profile/plan emit 0.0 there (the ArcGIS
    convention), total is gradient-free and unaffected.  Same halo
    economics and nodata rules as slope/aspect."""
    if kind not in ("total", "profile", "plan"):
        raise ValueError(f"kind must be total|profile|plan, got {kind!r}")

    def k(pad, rx, ry):
        z0 = pad[1:-1, 1:-1]
        e_, w_ = pad[1:-1, 2:], pad[1:-1, :-2]
        n_, s_ = pad[2:, 1:-1], pad[:-2, 1:-1]
        ne_, nw_ = pad[2:, 2:], pad[2:, :-2]
        se_, sw_ = pad[:-2, 2:], pad[:-2, :-2]
        D = ((w_ + e_) / 2 - z0) / (rx * rx)
        E = ((n_ + s_) / 2 - z0) / (ry * ry)
        Fc = (-nw_ + ne_ + sw_ - se_) / (4 * rx * ry)
        G = (-w_ + e_) / (2 * rx)
        H = (n_ - s_) / (2 * ry)
        if kind == "total":
            return -2 * (D + E)
        g2 = G * G + H * H
        with np.errstate(invalid="ignore", divide="ignore"):
            if kind == "plan":
                out = 2 * (D * H * H + E * G * G - Fc * G * H) / g2
            else:
                out = -2 * (D * G * G + E * H * H + Fc * G * H) / g2
        # zero-gradient cells: defined as 0 unless the window itself
        # is incomplete (NaN handled by the _focal nodata mask)
        return np.where(g2 == 0, 0.0, out)

    return _focal(tiles, origin_x=origin_x, origin_y=origin_y, kernel=k)
