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
