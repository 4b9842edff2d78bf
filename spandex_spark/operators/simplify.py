"""Geometry simplification — the ST_Simplify (Douglas-Peucker) analog.

Reference semantics: PostGIS `ST_Simplify(geom, tol)` — drop vertices
within ``tol`` of the local anchor chord, per ring; spandex-scale layers
(parcel boundaries traced from rasters) arrive heavily over-digitized and
every downstream kernel pays per-vertex, so simplification is a standard
pre-pass. Rings that collapse below 3 vertices are dropped; a geometry
losing every ring becomes NULL (mirrors trim's contract).

Per-feature Arrow-batched pandas UDF over the numpy kernel
(geom.simplify_ring) — the same per-feature-not-per-point shape as
overlay/trim.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from spandex_spark import geom as _geom
from spandex_spark.operators.trim import _GEOM_TYPE


def simplify(df: DataFrame, *, tolerance: float, geom_col: str = "geom",
             out_col: str = "geom_simplified") -> DataFrame:
    """Append a Douglas-Peucker-simplified copy of ``geom_col``."""
    tol = float(tolerance)

    @pandas_udf(_GEOM_TYPE)
    def _simp(xs: pd.Series, ys: pd.Series, roffs: pd.Series) -> pd.DataFrame:
        kinds, oxs, oys, offs, bboxes = [], [], [], [], []
        for x_arr, y_arr, o_arr in zip(xs, ys, roffs):
            sx = np.asarray(x_arr, np.float64)
            sy = np.asarray(y_arr, np.float64)
            o = (np.asarray(o_arr, np.int64)
                 if o_arr is not None and len(o_arr) > 2 else None)
            out_rings = []
            for rx, ry in _geom.rings_of(sx, sy, o):
                kx, ky = _geom.simplify_ring(rx, ry, tol)
                if kx.shape[0] >= 3:
                    out_rings.append((kx, ky))
            if not out_rings:
                kinds.append(None)
                oxs.append(None)
                oys.append(None)
                offs.append(None)
                bboxes.append(None)
            else:
                ax = np.concatenate([r[0] for r in out_rings])
                ay = np.concatenate([r[1] for r in out_rings])
                ro = np.cumsum([0] + [r[0].shape[0] for r in out_rings])
                kinds.append(3 if len(out_rings) == 1 else 6)
                oxs.append(ax.tolist())
                oys.append(ay.tolist())
                offs.append([int(v) for v in ro])
                bboxes.append({"minx": float(ax.min()), "miny": float(ay.min()),
                               "maxx": float(ax.max()), "maxy": float(ay.max())})
        return pd.DataFrame({"kind": pd.array(kinds, dtype="Int8"),
                             "xs": oxs, "ys": oys,
                             "ring_offsets": offs, "bbox": bboxes})

    g = F.col(geom_col)
    out = df.withColumn(out_col, _simp(g["xs"], g["ys"], g["ring_offsets"]))
    return out.withColumn(
        out_col, F.when(F.col(f"{out_col}.kind").isNotNull(), F.col(out_col)))


def convex_hull(df: DataFrame, *, geom_col: str = "geom",
                out_col: str = "geom_hull") -> DataFrame:
    """ST_ConvexHull analog: hull of every vertex of the geometry (all
    rings — holes cannot extend a hull). Degenerate (<3 strict hull
    vertices) geometries yield NULL."""

    @pandas_udf(_GEOM_TYPE)
    def _hull(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        kinds, oxs, oys, offs, bboxes = [], [], [], [], []
        for x_arr, y_arr in zip(xs, ys):
            sx = np.asarray(x_arr, np.float64)
            sy = np.asarray(y_arr, np.float64)
            hx, hy = _geom.convex_hull(sx, sy)
            if hx.shape[0] < 3:
                kinds.append(None)
                oxs.append(None)
                oys.append(None)
                offs.append(None)
                bboxes.append(None)
            else:
                kinds.append(3)
                oxs.append(hx.tolist())
                oys.append(hy.tolist())
                offs.append([0, int(hx.shape[0])])
                bboxes.append({"minx": float(hx.min()), "miny": float(hy.min()),
                               "maxx": float(hx.max()), "maxy": float(hy.max())})
        return pd.DataFrame({"kind": pd.array(kinds, dtype="Int8"),
                             "xs": oxs, "ys": oys,
                             "ring_offsets": offs, "bbox": bboxes})

    g = F.col(geom_col)
    out = df.withColumn(out_col, _hull(g["xs"], g["ys"]))
    return out.withColumn(
        out_col, F.when(F.col(f"{out_col}.kind").isNotNull(), F.col(out_col)))


def snap_to_grid(df: DataFrame, *, size: float, geom_col: str = "geom",
                 out_col: str | None = None) -> DataFrame:
    """ST_SnapToGrid analog: every vertex rounds to the nearest multiple
    of ``size`` — PURE codegen (two `transform` array expressions plus a
    bbox rebuild from array_min/max), no Python, no shuffle.

    Deviation from PostGIS, documented: consecutive vertices that
    collapse onto the same grid node are KEPT (removing them would
    re-index ring_offsets; run `make_valid` afterwards when a cleaned
    ring matters). NULL geometries stay NULL.
    """
    if size <= 0:
        raise ValueError("size must be positive")
    g = F.col(geom_col)

    def _snap(arr):
        return F.transform(arr, lambda v: F.round(v / F.lit(float(size)))
                           * F.lit(float(size)))

    xs, ys = _snap(g["xs"]), _snap(g["ys"])
    new = F.struct(
        g["kind"].alias("kind"), xs.alias("xs"), ys.alias("ys"),
        g["ring_offsets"].alias("ring_offsets"),
        F.struct(F.array_min(xs).alias("minx"),
                 F.array_min(ys).alias("miny"),
                 F.array_max(xs).alias("maxx"),
                 F.array_max(ys).alias("maxy")).alias("bbox"))
    return df.withColumn(out_col or geom_col,
                         F.when(g.isNotNull(), new))


def point_on_surface(df: DataFrame, *, geom_col: str = "geom",
                     out_col: str = "surface_point") -> DataFrame:
    """ST_PointOnSurface analog: a point GUARANTEED on/inside the
    geometry — what labeling and sampling actually need where centroid
    falls in the hole of a donut or outside an L. Polygons use the
    widest-scanline-interval kernel (geom.interior_point); linestrings
    return their middle vertex (documented simplification — PostGIS
    picks an interior vertex too); points return themselves. NULL in,
    NULL out. Per-row Arrow UDF, no shuffle."""
    point_type = T.StructType([T.StructField("x", T.DoubleType()),
                               T.StructField("y", T.DoubleType())])

    @pandas_udf(point_type)
    def _pos(kind: pd.Series, xs: pd.Series, ys: pd.Series,
             offs: pd.Series) -> pd.DataFrame:
        ox = np.full(len(xs), np.nan)
        oy = np.full(len(xs), np.nan)
        for i in range(len(xs)):
            k = kind.iloc[i]
            if k is None or pd.isna(k):
                continue
            k = int(k)
            rx = np.asarray(xs.iloc[i], np.float64)
            ry = np.asarray(ys.iloc[i], np.float64)
            if rx.shape[0] == 0:
                continue
            if k in (3, 6):
                ox[i], oy[i] = _geom.interior_point(rx, ry, offs.iloc[i])
            elif k == 2:
                m = rx.shape[0] // 2
                ox[i], oy[i] = rx[m], ry[m]
            else:
                ox[i], oy[i] = rx[0], ry[0]
        return pd.DataFrame({"x": ox, "y": oy})

    g = F.col(geom_col)
    out = df.withColumn(out_col, _pos(g["kind"], g["xs"], g["ys"],
                                      g["ring_offsets"]))
    return out.withColumn(
        out_col, F.when(F.col(f"{out_col}.x").isNotNull(),
                        F.col(out_col)))


def segmentize(df: DataFrame, *, max_length: float,
               geom_col: str = "geom",
               out_col: str | None = None) -> DataFrame:
    """ST_Segmentize analog (the densifying inverse of `simplify`): no
    output segment exceeds ``max_length`` — each segment splits into
    ceil(len/max_length) EQUAL pieces, so original vertices are all
    preserved and part/ring lengths are exactly unchanged. Per-ring
    vertex counts change, so ring_offsets are rebuilt. NULL in, NULL
    out. Per-row Arrow UDF over numpy interpolation, no shuffle."""
    if max_length <= 0:
        raise ValueError("max_length must be positive")

    @pandas_udf(_GEOM_TYPE)
    def _seg(kind: pd.Series, xs: pd.Series, ys: pd.Series,
             offs: pd.Series) -> pd.DataFrame:
        kinds, oxs, oys, ooffs, bbs = [], [], [], [], []
        for i in range(len(xs)):
            k = kind.iloc[i]
            if k is None or pd.isna(k):
                kinds.append(None); oxs.append(None); oys.append(None)
                ooffs.append(None); bbs.append(None)
                continue
            k = int(k)
            closed = k in (3, 6)
            nx_parts, ny_parts, no = [], [], [0]
            for rx, ry in _geom.rings_of(
                    np.asarray(xs.iloc[i], np.float64),
                    np.asarray(ys.iloc[i], np.float64), offs.iloc[i]):
                px, py = [], []
                n = rx.shape[0]
                segn = n if closed else n - 1
                for s in range(max(segn, 0)):
                    t = (s + 1) % n
                    seg_len = np.hypot(rx[t] - rx[s], ry[t] - ry[s])
                    pieces = max(int(np.ceil(seg_len / max_length)), 1)
                    f = np.arange(pieces) / pieces
                    px.append(rx[s] + f * (rx[t] - rx[s]))
                    py.append(ry[s] + f * (ry[t] - ry[s]))
                if not px:
                    px, py = [rx], [ry]
                elif not closed:
                    px.append(rx[-1:]); py.append(ry[-1:])
                nx_parts.append(np.concatenate(px))
                ny_parts.append(np.concatenate(py))
                no.append(no[-1] + nx_parts[-1].shape[0])
            ax = np.concatenate(nx_parts)
            ay = np.concatenate(ny_parts)
            kinds.append(k)
            oxs.append(ax.tolist()); oys.append(ay.tolist())
            ooffs.append([int(v) for v in no])
            bbs.append({"minx": float(ax.min()), "miny": float(ay.min()),
                        "maxx": float(ax.max()), "maxy": float(ay.max())})
        return pd.DataFrame({"kind": pd.array(kinds, dtype="Int8"),
                             "xs": oxs, "ys": oys,
                             "ring_offsets": ooffs, "bbox": bbs})

    out_col = out_col or geom_col
    g = F.col(geom_col)
    out = df.withColumn(out_col, _seg(g["kind"], g["xs"], g["ys"],
                                      g["ring_offsets"]))
    return out.withColumn(
        out_col, F.when(F.col(f"{out_col}.kind").isNotNull(),
                        F.col(out_col)))
