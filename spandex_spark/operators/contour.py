"""Raster contour lines (gdal_contour / ST_Contour analog): marching
squares over the pixel-center grid, distributed on the focal halo.

The raster→vector family's third member: `polygonize` emits
constant-value REGIONS, `rasterize` burns them back, `contour_lines`
emits ISO-LINES of a continuous field (elevation, density, score).

Distributed shape — built directly on `focal.halo_exchange`, so ONE
strip-sized shuffle:

* every 2x2 cell of adjacent pixel centers is owned by exactly one
  tile (the tile holding the cell's lower-left center); cells whose
  other corners live in the east/north neighbours read them from the
  1-px halo, so tile seams produce NO duplicate and NO missing
  segments (pytested: 4-tile output == single-big-tile output);
* each tile emits raw SEGMENTS (value, x1,y1,x2,y2) — an honest
  map-stage primitive, contour-length-sized;
* `assemble_contours` optionally chains segments into polylines with
  one groupBy(value) shuffle carrying only the segments. Endpoints
  computed from the same two corner values are bit-identical across
  tiles (identical interpolation arithmetic), so chaining keys are
  exact after a 1e-9 quantisation guard.

Semantics: a corner is "inside" iff ``value > level`` (strict —
documented; fields equal to the level on a corner are the caller's
degenerate case to nudge). Linear interpolation on crossing edges.
Saddle cells (cases 5/10) disambiguate by the cell's center average —
the standard marching-squares rule. Cells touching NaN/NULL pixels
emit nothing (gdal nodata behaviour).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from spandex_spark.operators.focal import halo_exchange

_SEG_SCHEMA = T.StructType([
    T.StructField("value", T.DoubleType()),
    T.StructField("x1", T.DoubleType()),
    T.StructField("y1", T.DoubleType()),
    T.StructField("x2", T.DoubleType()),
    T.StructField("y2", T.DoubleType()),
    T.StructField("tile_id", T.LongType()),
])

_LINE_SCHEMA = T.StructType([
    T.StructField("value", T.DoubleType()),
    T.StructField("part", T.IntegerType()),
    T.StructField("xs", T.ArrayType(T.DoubleType())),
    T.StructField("ys", T.ArrayType(T.DoubleType())),
    T.StructField("closed", T.BooleanType()),
    T.StructField("length", T.DoubleType()),
])

# case -> list of (edge_from, edge_to); edges: B(ottom) R(ight) T(op) L(eft)
_CASES = {
    1: [("L", "B")], 2: [("B", "R")], 3: [("L", "R")], 4: [("T", "R")],
    6: [("B", "T")], 7: [("L", "T")], 8: [("L", "T")], 9: [("B", "T")],
    11: [("T", "R")], 12: [("L", "R")], 13: [("B", "R")], 14: [("L", "B")],
}
_SADDLE = {5: {True: [("L", "T"), ("B", "R")],
               False: [("L", "B"), ("T", "R")]},
           10: {True: [("L", "B"), ("T", "R")],
                False: [("L", "T"), ("B", "R")]}}


def _cell_segments(pad: np.ndarray, meta: dict, levels) -> list[tuple]:
    nx, ny = meta["nx"], meta["ny"]
    res, res_y = meta["res"], meta["res_y"]
    x0, y0 = meta["x0"], meta["y0"]
    ll = pad[1:ny + 1, 1:nx + 1]
    lr = pad[1:ny + 1, 2:nx + 2]
    ul = pad[2:ny + 2, 1:nx + 1]
    ur = pad[2:ny + 2, 2:nx + 2]
    valid = ~(np.isnan(ll) | np.isnan(lr) | np.isnan(ul) | np.isnan(ur))
    out = []
    for v in levels:
        code = ((ll > v).astype(np.int8) + 2 * (lr > v) + 4 * (ur > v)
                + 8 * (ul > v))
        for case in range(1, 15):
            sel = valid & (code == case)
            if not sel.any():
                continue
            rr, cc = np.nonzero(sel)
            a_ll, a_lr = ll[rr, cc], lr[rr, cc]
            a_ul, a_ur = ul[rr, cc], ur[rr, cc]
            xc = x0 + (cc + 0.5) * res
            yr = y0 + (rr + 0.5) * res_y

            def edge(e):
                if e == "B":
                    t = (v - a_ll) / (a_lr - a_ll)
                    return xc + t * res, yr
                if e == "T":
                    t = (v - a_ul) / (a_ur - a_ul)
                    return xc + t * res, yr + res_y
                if e == "L":
                    t = (v - a_ll) / (a_ul - a_ll)
                    return xc, yr + t * res_y
                t = (v - a_lr) / (a_ur - a_lr)       # R
                return xc + res, yr + t * res_y

            if case in _SADDLE:
                center_in = (a_ll + a_lr + a_ul + a_ur) / 4.0 > v
                for half in (True, False):
                    m = center_in == half
                    if not m.any():
                        continue
                    for e1, e2 in _SADDLE[case][half]:
                        X1, Y1 = edge(e1)
                        X2, Y2 = edge(e2)
                        for i in np.nonzero(m)[0]:
                            out.append((float(v), float(X1[i]), float(Y1[i]),
                                        float(X2[i]), float(Y2[i]),
                                        meta["tile_id"]))
            else:
                for e1, e2 in _CASES[case]:
                    X1, Y1 = edge(e1)
                    X2, Y2 = edge(e2)
                    for i in range(rr.shape[0]):
                        out.append((float(v), float(X1[i]), float(Y1[i]),
                                    float(X2[i]), float(Y2[i]),
                                    meta["tile_id"]))
    return out


def contour_lines(tiles: DataFrame, *, levels, origin_x: float,
                  origin_y: float) -> DataFrame:
    """Raw contour segments at each of ``levels`` —
    (value, x1, y1, x2, y2, tile_id), one halo shuffle total."""
    levels = [float(v) for v in levels]
    if not levels:
        raise ValueError("levels must be non-empty")
    return halo_exchange(
        tiles, origin_x=origin_x, origin_y=origin_y,
        per_tile=lambda pad, meta: _cell_segments(pad, meta, levels),
        out_schema=_SEG_SCHEMA)


def assemble_contours(segments: DataFrame, *,
                      quant: float = 1e-9) -> DataFrame:
    """Chain segments into polylines per level (one groupBy(value)
    shuffle carrying segments only). Open lines start at degree-1
    endpoints; what remains chains into closed rings."""

    def chain(key, pdf: pd.DataFrame) -> pd.DataFrame:
        v = float(key[0])

        def q(x, y):
            return (round(x / quant), round(y / quant))

        adj: dict[tuple, list[int]] = {}
        segs = []
        for i, r in enumerate(pdf.itertuples(index=False)):
            segs.append(((r.x1, r.y1), (r.x2, r.y2)))
            adj.setdefault(q(r.x1, r.y1), []).append(i)
            adj.setdefault(q(r.x2, r.y2), []).append(i)
        used = [False] * len(segs)
        rows = []

        def walk(start_node):
            path = [start_node]
            node = start_node
            while True:
                nxt = None
                for si in adj.get(q(*node), []):
                    if used[si]:
                        continue
                    a, b = segs[si]
                    used[si] = True
                    nxt = b if q(*a) == q(*node) else a
                    break
                if nxt is None:
                    return path
                path.append(nxt)
                node = nxt

        part = 0
        # open polylines first (degree-odd endpoints)
        for node_key, incident in list(adj.items()):
            if sum(1 for si in incident if not used[si]) % 2 == 1:
                # recover an actual coordinate for the key
                si = next(s for s in incident if not used[s])
                a, b = segs[si]
                start = a if q(*a) == node_key else b
                path = walk(start)
                if len(path) > 1:
                    rows.append((path, False))
        # remaining cycles
        for si in range(len(segs)):
            if not used[si]:
                path = walk(segs[si][0])
                if len(path) > 1:
                    rows.append((path, True))
        out = []
        for path, closed in rows:
            xs = [p[0] for p in path]
            ys = [p[1] for p in path]
            ln = float(sum(np.hypot(xs[i + 1] - xs[i], ys[i + 1] - ys[i])
                           for i in range(len(xs) - 1)))
            out.append((v, part, xs, ys, closed, ln))
            part += 1
        return pd.DataFrame(
            out, columns=["value", "part", "xs", "ys", "closed", "length"])

    return segments.groupBy("value").applyInPandas(chain, _LINE_SCHEMA)
