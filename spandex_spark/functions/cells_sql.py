"""Quadkey cell id as PURE JVM Column expressions (whole-stage codegen).

The point-side cell assignment is the hottest expression in every spatial
join — evaluating it as a pandas UDF costs a full Arrow round trip per
pass, and Catalyst may evaluate join-key expressions twice (null-filter +
projection). The morton interleave is 12 shift/and/or ops per coordinate
(the classic spread-bits ladder), so it runs entirely inside codegen here.
Bit-identical to cells.cell_of (tested in tests/test_cells_sql.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from spandex_spark.cells import LEVEL_SHIFT

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_expr(v: Column) -> Column:
    for shift, mask in _MASKS:
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
    return v


def grid_coord_expr(coord: Column, origin: float, extent: float,
                    level: int) -> Column:
    n = 1 << level
    # same op order as cells.grid_coords: (coord - origin)/extent * n → floor
    g = F.floor((coord - F.lit(origin)) / F.lit(extent) * F.lit(float(n)))
    return F.greatest(F.lit(0).cast("long"),
                      F.least(F.lit(n - 1).cast("long"), g.cast("long")))


def cell_of_expr(lon: Column, lat: Column, level: int) -> Column:
    """JVM-side equivalent of cells.cell_of (same floats, same bits)."""
    gx = grid_coord_expr(lon, -180.0, 360.0, level)
    gy = grid_coord_expr(lat, -90.0, 180.0, level)
    return (F.lit(level << LEVEL_SHIFT)
            .bitwiseOR(_spread_expr(gx))
            .bitwiseOR(F.shiftleft(_spread_expr(gy), 1)))


def cell_parent_expr(cell: Column, child_level: int, parent_level: int) -> Column:
    """Ancestor cell at a coarser level (prefix shift), JVM-side. The child
    level is a plan-time constant (the shift count must be a literal)."""
    morton = cell.bitwiseAND(F.lit((1 << LEVEL_SHIFT) - 1))
    return (F.lit(parent_level << LEVEL_SHIFT)
            .bitwiseOR(F.shiftrightunsigned(morton,
                                            2 * (child_level - parent_level))))


def bbox_cells_expr(minx: Column, miny: Column, maxx: Column,
                    maxy: Column, level: int) -> Column:
    """Covering cells of a bbox as a PURE JVM array expression —
    bit-identical to cells.cover_bbox (sequence over the clamped grid
    index ranges, morton-interleaved per element inside codegen). This is
    the candidate-cell generator of the overlay/erase_join/predicate
    chassis; as a pandas UDF it was those operators' only Python stage
    outside the exact kernels."""
    gx0 = grid_coord_expr(minx, -180.0, 360.0, level)
    gx1 = grid_coord_expr(maxx, -180.0, 360.0, level)
    gy0 = grid_coord_expr(miny, -90.0, 180.0, level)
    gy1 = grid_coord_expr(maxy, -90.0, 180.0, level)
    head = F.lit(level << LEVEL_SHIFT)
    return F.flatten(F.transform(
        F.sequence(gy0, gy1),
        lambda gy: F.transform(
            F.sequence(gx0, gx1),
            lambda gx: head.bitwiseOR(_spread_expr(gx))
            .bitwiseOR(F.shiftleft(_spread_expr(gy), 1)))))


def morton_cell_expr(gx: Column, gy: Column, level: int) -> Column:
    """Cell id from integer grid coordinates (the xy_to_cell analog)."""
    return (F.lit(level << LEVEL_SHIFT)
            .bitwiseOR(_spread_expr(gx))
            .bitwiseOR(F.shiftleft(_spread_expr(gy), 1)))


def explode_bbox_cells(df, minx: Column, miny: Column, maxx: Column,
                       maxy: Column, level: int, out_col: str = "cell"):
    """One row per bbox-covering cell via two scalar sequence-explodes —
    the WHOLE-STAGE-CODEGEN form of bbox_cells_expr (Spark evaluates
    higher-order array lambdas interpreted, which measured ~5x slower
    than two Generates + the scalar morton ladder on this chassis).
    Same cells, same clamping, bit-identical ids."""
    gx0 = grid_coord_expr(minx, -180.0, 360.0, level)
    gx1 = grid_coord_expr(maxx, -180.0, 360.0, level)
    gy0 = grid_coord_expr(miny, -90.0, 180.0, level)
    gy1 = grid_coord_expr(maxy, -90.0, 180.0, level)
    out = (df.withColumn("_bgx", F.explode(F.sequence(gx0, gx1)))
           .withColumn("_bgy", F.explode(F.sequence(gy0, gy1)))
           .withColumn(out_col, morton_cell_expr(F.col("_bgx"),
                                                 F.col("_bgy"), level)))
    return out.drop("_bgx", "_bgy")
