"""Raster warp — reproject a tiled raster into another CRS.

Reference semantics: `gdalwarp` (default resampling = NEAREST
NEIGHBOR, which is what this implements) / PostGIS ST_Transform on
raster: produce a raster on a regular grid in the TARGET CRS whose
pixel values come from the source raster in the source CRS.

Composition, not new machinery — warp is inverse-projection + point
sampling + tile assembly, all already-verified operators:

1. the output lattice (target-CRS pixel centers) generates in-plan
   (`spark.range`, the interpolate.py pattern);
2. centers inverse-project to source lon/lat
   (operators/reproject.py::reproject_inverse — Snyder analytic
   inverses, vectorized Arrow UDFs);
3. `operators/zonal.py::raster_sample` looks every center up in the
   source tiles (pure JVM: integer tile key + element_at; the tile
   table broadcasts by default, or shuffles points by tile key for
   continent rasters via ``broadcast_tiles=False``);
4. one groupBy(output tile) assembles value arrays via
   array_sort(collect_list) — pure codegen, the trajectory.make_line
   shape.

Output: the engine tile convention (tile_id, x0, y0, res, res_y, nx,
ny, values) in TARGET-CRS coordinates; centers that fall off the
source raster come out NULL (raster_sample's convention).

Scale shape: one lattice-sized Arrow pass (the inverse series), one
JVM sample join, one groupBy; no iteration.  Bilinear warp =
`resample_tiles` when the CRSs match; cross-CRS bilinear would need
the four-neighbour gather inside the sample join — documented as the
upgrade path, nearest is gdalwarp's own default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spandex_spark.operators.reproject import reproject_inverse
from spandex_spark.operators.zonal import raster_sample

__all__ = ["warp_tiles"]


def warp_tiles(tiles: DataFrame, *, from_srid_of_output: int,
               x0_out: float, y0_out: float, res_out: float,
               nx_out: int, ny_out: int, origin_x: float,
               origin_y: float, tile_px: int = 50,
               broadcast_tiles: bool = True) -> DataFrame:
    """Warp lon/lat `tiles` onto a regular grid in the projected CRS
    `from_srid_of_output` (EPSG:3857, UTM, LCC, or Albers — the
    reproject.py families).  Grid spec (x0/y0/res/nx/ny) is in TARGET
    units (meters); `origin_x/origin_y` anchor the SOURCE tiling
    (degrees), as in raster_sample."""
    spark = tiles.sparkSession
    n_tx = (nx_out + tile_px - 1) // tile_px
    lattice = (spark.range(nx_out * ny_out)
               .select((F.col("id") % nx_out).cast("int").alias("gx"),
                       F.floor(F.col("id") / F.lit(nx_out)).cast("int")
                       .alias("gy")))
    lattice = lattice.select(
        "gx", "gy",
        (F.lit(x0_out) + (F.col("gx") + F.lit(0.5)) * F.lit(res_out))
        .alias("x"),
        (F.lit(y0_out) + (F.col("gy") + F.lit(0.5)) * F.lit(res_out))
        .alias("y"),
        (F.col("gx") + F.lit(nx_out) * F.col("gy")).cast("long")
        .alias("_pid"))
    pts = reproject_inverse(lattice, from_srid=from_srid_of_output)
    sampled = raster_sample(pts, tiles, point_id_col="_pid",
                            origin_x=origin_x, origin_y=origin_y,
                            broadcast_tiles=broadcast_tiles)
    px = sampled.select(
        "_pid", "v",
        (F.col("_pid") % nx_out).cast("int").alias("gx"),
        F.floor(F.col("_pid") / F.lit(nx_out)).cast("int").alias("gy"))
    tx = F.floor(F.col("gx") / F.lit(tile_px)).cast("int")
    ty = F.floor(F.col("gy") / F.lit(tile_px)).cast("int")
    keyed = px.select(
        "v", tx.alias("_tx"), ty.alias("_ty"),
        # within-tile row-major position orders the collect_list
        ((F.col("gy") - ty * F.lit(tile_px)) * F.lit(tile_px)
         + (F.col("gx") - tx * F.lit(tile_px))).alias("_pos"))
    g = (keyed.groupBy("_tx", "_ty")
         .agg(F.array_sort(F.collect_list(
             F.struct(F.col("_pos"), F.col("v")))).alias("_pv")))
    vals = F.transform("_pv", lambda s: s["v"])
    w = F.least(F.lit(tile_px), F.lit(nx_out) - F.col("_tx")
                * F.lit(tile_px))
    h = F.least(F.lit(tile_px), F.lit(ny_out) - F.col("_ty")
                * F.lit(tile_px))
    return g.select(
        (F.col("_ty") * F.lit(n_tx) + F.col("_tx")).cast("long")
        .alias("tile_id"),
        (F.lit(x0_out) + F.col("_tx") * F.lit(tile_px * res_out))
        .alias("x0"),
        (F.lit(y0_out) + F.col("_ty") * F.lit(tile_px * res_out))
        .alias("y0"),
        F.lit(res_out).alias("res"), F.lit(res_out).alias("res_y"),
        w.cast("int").alias("nx"), h.cast("int").alias("ny"),
        vals.alias("values"))
