"""Affine geometry transforms — the ST_Affine / ST_Translate /
ST_Scale / ST_Rotate family.

Reference semantics: PostGIS 2D affine,
``x' = a·x + b·y + xoff,  y' = d·x + e·y + yoff`` applied to every
vertex. spandex pipelines use these for layer nudging (datum shims),
unit scaling, and rotating local engineering grids into north-up.

PURE codegen — two `transform` array expressions plus a bbox rebuild
from array_min/max (the snap_to_grid pattern, operators/simplify.py):
no Python, no shuffle, whole-stage-codegen friendly at 10^12 rows.
ring_offsets and kind pass through untouched (affine maps preserve
ring structure); NULL geometries stay NULL. Note a negative
determinant (mirror) flips ring orientation — callers that rely on
CCW-outer should run make_valid after mirroring, same caveat PostGIS
documents for ST_Scale with negative factors.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def affine_transform(df: DataFrame, *, a: float, b: float, d: float,
                     e: float, xoff: float = 0.0, yoff: float = 0.0,
                     geom_col: str = "geom",
                     out_col: str | None = None) -> DataFrame:
    """ST_Affine (2D) analog; see module docstring."""
    out_col = out_col or geom_col
    g = F.col(geom_col)
    xs, ys = g["xs"], g["ys"]
    nx = F.zip_with(xs, ys, lambda x, y:
                    F.lit(float(a)) * x + F.lit(float(b)) * y
                    + F.lit(float(xoff)))
    ny = F.zip_with(xs, ys, lambda x, y:
                    F.lit(float(d)) * x + F.lit(float(e)) * y
                    + F.lit(float(yoff)))
    moved = F.struct(
        g["kind"].alias("kind"), nx.alias("xs"), ny.alias("ys"),
        g["ring_offsets"].alias("ring_offsets"),
        F.struct(F.array_min(nx).alias("minx"),
                 F.array_min(ny).alias("miny"),
                 F.array_max(nx).alias("maxx"),
                 F.array_max(ny).alias("maxy")).alias("bbox"))
    return df.withColumn(out_col, F.when(g["kind"].isNotNull(), moved))


def translate(df: DataFrame, *, dx: float, dy: float,
              geom_col: str = "geom",
              out_col: str | None = None) -> DataFrame:
    """ST_Translate analog."""
    return affine_transform(df, a=1.0, b=0.0, d=0.0, e=1.0,
                            xoff=dx, yoff=dy, geom_col=geom_col,
                            out_col=out_col)


def scale_geom(df: DataFrame, *, sx: float, sy: float | None = None,
               origin: tuple[float, float] = (0.0, 0.0),
               geom_col: str = "geom",
               out_col: str | None = None) -> DataFrame:
    """ST_Scale analog about ``origin`` (PostGIS scales about (0,0);
    the explicit origin saves the translate-scale-translate dance)."""
    sy = sx if sy is None else sy
    ox, oy = origin
    return affine_transform(df, a=sx, b=0.0, d=0.0, e=sy,
                            xoff=ox - sx * ox, yoff=oy - sy * oy,
                            geom_col=geom_col, out_col=out_col)


def rotate(df: DataFrame, *, radians: float,
           origin: tuple[float, float] = (0.0, 0.0),
           geom_col: str = "geom",
           out_col: str | None = None) -> DataFrame:
    """ST_Rotate analog: CCW about ``origin``."""
    c, s = math.cos(radians), math.sin(radians)
    ox, oy = origin
    return affine_transform(
        df, a=c, b=-s, d=s, e=c,
        xoff=ox - c * ox + s * oy, yoff=oy - s * ox - c * oy,
        geom_col=geom_col, out_col=out_col)
