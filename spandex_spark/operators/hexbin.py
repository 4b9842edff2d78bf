"""Hexagonal binning — the hex-grid density aggregation.

Reference semantics: hex binning is the cartographic standard for
point-density maps (matplotlib hexbin, deck.gl HexagonLayer, Uber's
H3 motivation): hexagons are the only regular tessellation whose
cells have a SINGLE neighbor distance, so binned densities have no
axis bias.  The engine's hierarchical cells stay quadkey (SURVEY.md
§4.3 — a settled decision); hexbin is the flat per-level analytics
complement, matching PostGIS `ST_HexagonGrid` + count-per-cell.

Axial/cube coordinate math per the standard construction (Patel,
"Hexagonal Grids", Red Blob Games — the reference everyone,
including H3's docs, cites): pointy-top hexes of circumradius
`size`, fractional axial coords from the inverse basis, then CUBE
ROUNDING — round all three cube components and re-derive the one
with the largest rounding error from the other two (keeps
x + y + z == 0, which is exactly the nearest-center assignment).

Spark realization: pure JVM codegen — two fused projections and a
three-way CASE; ONE groupBy(q, r) shuffle with map-side combine.
Spark's round() is HALF_UP (away from zero); points exactly on a
cell edge deterministically round outward, documented rather than
jittered.  Output carries the hex center (cx, cy) so rendering and
spatial joins need no second pass.

Scale shape: identical to tile_pyramid's base level — the shuffle
carries one row per OCCUPIED hex per map partition.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hexbin"]

_SQRT3 = math.sqrt(3.0)


def hexbin(points: DataFrame, *, size: float, x_col: str = "lon",
           y_col: str = "lat",
           weight_col: str | None = None) -> DataFrame:
    """Bin points into pointy-top hexagons of circumradius `size`
    (planar units).  Output: (q, r [axial coords], cx, cy [center],
    n [, wsum]).  NULL coordinates drop (no hex owns them)."""
    if size <= 0:
        raise ValueError("size must be positive")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    qf = (F.lit(_SQRT3 / 3.0) * x - y / F.lit(3.0)) / F.lit(float(size))
    rf = (F.lit(2.0 / 3.0) * y) / F.lit(float(size))
    base = (points.filter(x.isNotNull() & y.isNotNull())
            .select(qf.alias("_qf"), rf.alias("_rf"),
                    *([F.col(weight_col).cast("double").alias("_w")]
                      if weight_col else [])))
    xf = F.col("_qf")
    zf = F.col("_rf")
    yf = -xf - zf
    rx, ry, rz = F.round(xf, 0), F.round(yf, 0), F.round(zf, 0)
    dx, dy, dz = F.abs(rx - xf), F.abs(ry - yf), F.abs(rz - zf)
    # re-derive the worst-rounded component so x + y + z stays 0
    fx = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx)
    fz = F.when((dx > dy) & (dx > dz), rz) \
        .when(dy > dz, rz).otherwise(-rx - ry)
    cells = base.select(
        fx.cast("long").alias("q"), fz.cast("long").alias("r"),
        *([F.col("_w")] if weight_col else []))
    aggs = [F.count(F.lit(1)).alias("n")]
    if weight_col:
        aggs.append(F.sum("_w").alias("wsum"))
    out = cells.groupBy("q", "r").agg(*aggs)
    cx = F.lit(float(size) * _SQRT3) * (F.col("q")
                                        + F.col("r") / F.lit(2.0))
    cy = F.lit(float(size) * 1.5) * F.col("r")
    return out.select("q", "r", cx.alias("cx"), cy.alias("cy"), "n",
                      *(["wsum"] if weight_col else []))
