"""Raster polygonize: constant-value pixel regions -> vector geometry.

The ST_DumpAsPolygons / GDALPolygonize / rasterio.features.shapes analog
(the reference's rastertoolz side exposes raster->vector through PostGIS
raster SQL; SURVEY.md §2 O7). Returns one row per distinct pixel value
with the region's boundary rings as a standard even-odd geometry struct
(holes CW, outers CCW — multi-region values come out as multipolygons),
plus the exact pixel count.

Two stages, ONE shuffle (on the value key) — the marching is per-tile
and the merge is the engine's directed-edge cancellation:

1. **Per-tile boundary trace** (mapInPandas, no shuffle): for each
   distinct value in the tile, boundary edges are extracted VECTORIZED —
   a pixel contributes its bottom/right/top/left edge iff the
   4-neighbour across that edge has a different value (or is outside
   the tile) — then chained into rings on exact integer grid keys.
   CCW pixel-edge orientation makes outer rings CCW and holes CW with
   no post-pass. Edge count ~ region perimeter, not area.
2. **Cross-tile dissolve** (groupBy(value) + applyInPandas):
   `geom.dissolve_rings` cancels opposite directed seam edges — a tile
   border emitted by both neighbouring tiles for the same value
   disappears exactly, the same mechanism `dissolve_by` uses for
   parcel tilings. Values whose region crosses no tile seam pass
   through the kernel untouched.

Pinch corners (two diagonal pixels of the same value meeting at a
vertex) follow `dissolve_rings`' contract: chaining picks an arbitrary
continuation; the boundary edge SET — hence even-odd region, area, and
pixel membership — is exact (4-connectivity reading, pytested).

Scale shape (a 100 TB raster): stage 1 is embarrassingly parallel over
tiles; the shuffle carries boundary RINGS (perimeter-sized), never
pixels; stage 2's per-value work is proportional to that value's total
boundary length. A value spanning the whole raster (ocean=0) makes a
hot key whose ring payload is still only its coastline. ``min_pixels``
drops speckle values before the shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spandex_spark import geom as G
from spandex_spark.operators.zonal import _with_res_y

_RING_SCHEMA = T.StructType([
    T.StructField("value", T.DoubleType()),
    T.StructField("n_px", T.LongType()),
    T.StructField("rxs", T.ArrayType(T.DoubleType())),
    T.StructField("rys", T.ArrayType(T.DoubleType())),
])

_OUT_SCHEMA = T.StructType([
    T.StructField("value", T.DoubleType()),
    T.StructField("n_pixels", T.LongType()),
    T.StructField("geom", T.StructType([
        T.StructField("kind", T.ByteType()),
        T.StructField("xs", T.ArrayType(T.DoubleType())),
        T.StructField("ys", T.ArrayType(T.DoubleType())),
        T.StructField("ring_offsets", T.ArrayType(T.IntegerType())),
        T.StructField("bbox", T.StructType([
            T.StructField("minx", T.DoubleType()),
            T.StructField("miny", T.DoubleType()),
            T.StructField("maxx", T.DoubleType()),
            T.StructField("maxy", T.DoubleType())])),
    ])),
])


def _trace_mask(mask: np.ndarray) -> list:
    """Boundary rings of a boolean pixel mask in GRID coordinates
    (col, row), pixel (r, c) spanning [c, c+1] x [r, r+1]. Returns a list
    of (gx, gy) integer vertex arrays, outer CCW / holes CW (y up)."""
    ny, nx = mask.shape
    pad = np.zeros((ny + 2, nx + 2), dtype=bool)
    pad[1:-1, 1:-1] = mask
    rr, cc = np.nonzero(mask)
    # neighbour-differs tests, vectorized over the region's pixels
    bottom = ~pad[rr, cc + 1]          # neighbour (r-1, c)
    top = ~pad[rr + 2, cc + 1]         # neighbour (r+1, c)
    left = ~pad[rr + 1, cc]            # neighbour (r, c-1)
    right = ~pad[rr + 1, cc + 2]       # neighbour (r, c+1)
    # directed edges (CCW around the pixel, y up):
    #   bottom: (c, r) -> (c+1, r);  right: (c+1, r) -> (c+1, r+1)
    #   top:    (c+1, r+1) -> (c, r+1);  left: (c, r+1) -> (c, r)
    segs = []
    b = np.nonzero(bottom)[0]
    segs.append(np.stack([cc[b], rr[b], cc[b] + 1, rr[b]], 1))
    r_ = np.nonzero(right)[0]
    segs.append(np.stack([cc[r_] + 1, rr[r_], cc[r_] + 1, rr[r_] + 1], 1))
    t = np.nonzero(top)[0]
    segs.append(np.stack([cc[t] + 1, rr[t] + 1, cc[t], rr[t] + 1], 1))
    lf = np.nonzero(left)[0]
    segs.append(np.stack([cc[lf], rr[lf] + 1, cc[lf], rr[lf]], 1))
    edges = np.concatenate(segs, 0)
    succ: dict = {}
    for x0, y0, x1, y1 in edges.tolist():
        succ.setdefault((x0, y0), []).append((x1, y1))
    rings = []
    while succ:
        start = next(iter(succ))
        cur = start
        pts = []
        while True:
            nxt = succ[cur].pop()
            if not succ[cur]:
                del succ[cur]
            pts.append(cur)
            cur = nxt
            if cur == start:
                break
        # drop collinear mid-vertices (runs of unit edges on one line)
        gx = np.array([p[0] for p in pts], np.int64)
        gy = np.array([p[1] for p in pts], np.int64)
        m = gx.shape[0]
        h = (np.arange(m) - 1) % m
        j = (np.arange(m) + 1) % m
        cross = ((gx - gx[h]) * (gy[j] - gy)
                 - (gy - gy[h]) * (gx[j] - gx))
        keep = cross != 0
        rings.append((gx[keep], gy[keep]))
    return rings


def polygonize(tiles: DataFrame, *, min_pixels: int = 1) -> DataFrame:
    """(value, n_pixels, geom) per distinct raster value; see module
    docstring. ``min_pixels`` drops values with fewer pixels per TILE
    before the shuffle (speckle guard; a value split across tiles is
    judged per tile, documented)."""
    tiles = _with_res_y(tiles)

    def _stage1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_v, out_n, out_x, out_y = [], [], [], []
            for row in pdf.itertuples(index=False):
                vals = np.asarray(row.values, np.float64).reshape(
                    int(row.ny), int(row.nx))
                res, res_y = float(row.res), float(row.res_y)
                x0, y0 = float(row.x0), float(row.y0)
                for v in np.unique(vals[~np.isnan(vals)]):
                    mask = vals == v
                    n_px = int(mask.sum())
                    if n_px < min_pixels:
                        continue
                    for gx, gy in _trace_mask(mask):
                        out_v.append(float(v))
                        out_n.append(n_px)
                        out_x.append((x0 + gx * res).tolist())
                        out_y.append((y0 + gy * res_y).tolist())
                        n_px = 0  # count each tile-value once
            # explicit dtypes: an all-filtered batch must not emit empty
            # float64 columns where Arrow expects list<double>
            yield pd.DataFrame(
                {"value": pd.Series(out_v, dtype="float64"),
                 "n_px": pd.Series(out_n, dtype="int64"),
                 "rxs": pd.Series(out_x, dtype="object"),
                 "rys": pd.Series(out_y, dtype="object")})

    rings_df = tiles.mapInPandas(_stage1, schema=_RING_SCHEMA)

    def _stage2(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rings = [(np.asarray(x, np.float64), np.asarray(y, np.float64))
                 for x, y in zip(pdf["rxs"], pdf["rys"])]
        merged = G.dissolve_rings(rings)
        if not merged:
            return pd.DataFrame(
                {"value": pd.Series([], dtype="float64"),
                 "n_pixels": pd.Series([], dtype="int64"),
                 "geom": pd.Series([], dtype="object")})
        ax = np.concatenate([r[0] for r in merged])
        ay = np.concatenate([r[1] for r in merged])
        ro = np.cumsum([0] + [r[0].shape[0] for r in merged])
        geom = {"kind": 3 if len(merged) == 1 else 6,
                "xs": ax.tolist(), "ys": ay.tolist(),
                "ring_offsets": [int(i) for i in ro],
                "bbox": {"minx": float(ax.min()), "miny": float(ay.min()),
                         "maxx": float(ax.max()), "maxy": float(ay.max())}}
        return pd.DataFrame({"value": [float(key[0])],
                             "n_pixels": [int(pdf["n_px"].sum())],
                             "geom": [geom]})

    return (rings_df.groupBy("value")
            .applyInPandas(_stage2, schema=_OUT_SCHEMA))
