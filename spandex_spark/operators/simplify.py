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
