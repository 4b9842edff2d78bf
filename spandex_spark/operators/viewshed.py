"""Viewshed — line-of-sight visibility over the raster tile table
(GRASS r.viewshed / ArcGIS Visibility), as pure DataFrame plumbing.

The sampling formulation: each observer casts ``n_rays`` azimuth rays,
each ray is sampled every ``step`` CRS units out to ``max_dist``, every
sample reads its elevation through the raster_sample tile-key join
(regular tiling contract, zonal.py::raster_sample), and a sample is
visible iff its elevation angle exceeds the running maximum of all
angles EARLIER on its ray — one window function ordered by step index.
No Python anywhere: rays and steps are sequence/explode arithmetic,
elevation is the codegen tile join, occlusion is
``max().over(rowsBetween(unboundedPreceding, -1))``.

Scale shape: cost = observers × n_rays × (max_dist/step) sample rows —
chosen explicitly by the caller, independent of raster size; the tile
join broadcasts while the raster fits (or shuffles by tile key,
raster_sample's contract), and the occlusion window shuffles once on
(observer, ray).  This is the classic sampling viewshed (exact
per-pixel R3 is quadratic per observer and does not distribute);
angular resolution = n_rays, radial = step, both documented knobs.

Off-raster samples come back visible=NULL and do NOT occlude
(max() skips nulls) — the r.viewshed "unknown outside region" rule.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spandex_spark.operators.zonal import raster_sample

__all__ = ["viewshed", "viewshed_counts"]


def viewshed(observers: DataFrame, tiles: DataFrame, *,
             observer_id_col: str, origin_x: float, origin_y: float,
             max_dist: float, step: float, n_rays: int = 180,
             observer_height: float = 1.8, target_height: float = 0.0,
             lon_col: str = "lon", lat_col: str = "lat",
             broadcast_tiles: bool = True) -> DataFrame:
    """(observer_id, ray, s, lon, lat, dist, visible) per ray sample.
    ``ray`` is the azimuth index (2πk/n_rays from east, CCW); ``s`` the
    1-based step index (dist = s·step)."""
    if step <= 0 or max_dist <= 0 or n_rays <= 0:
        raise ValueError("step, max_dist, n_rays must be positive")
    n_steps = int(math.floor(max_dist / step))
    if n_steps < 1:
        raise ValueError("max_dist must cover at least one step")

    obs = observers.select(
        F.col(observer_id_col).alias("_oid"),
        F.col(lon_col).alias("_olon"), F.col(lat_col).alias("_olat"))
    base = raster_sample(
        obs, tiles, point_id_col="_oid", origin_x=origin_x,
        origin_y=origin_y, lon_col="_olon", lat_col="_olat",
        out_col="_oelev", broadcast_tiles=broadcast_tiles)
    obs = obs.join(base, "_oid")

    two_pi = 2.0 * math.pi
    rays = obs.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_rays - 1)))
        .alias("ray"))
    az = F.col("ray") * F.lit(two_pi / n_rays)
    samples = (rays
               .select("*", F.explode(F.sequence(F.lit(1),
                                                 F.lit(n_steps)))
                       .alias("s"))
               .withColumn("dist", F.col("s") * F.lit(float(step)))
               .withColumn("_slon", F.col("_olon")
                           + F.col("dist") * F.cos(az))
               .withColumn("_slat", F.col("_olat")
                           + F.col("dist") * F.sin(az)))
    pt = F.struct("_oid", "ray", "s", "dist", "_oelev",
                  F.col("_slon").alias("lon"), F.col("_slat").alias("lat"))
    sampled = raster_sample(
        samples.select(pt.alias("p")), tiles, point_id_col="p",
        origin_x=origin_x, origin_y=origin_y,
        lon_col="p.lon", lat_col="p.lat", out_col="_elev",
        broadcast_tiles=broadcast_tiles)
    ang = ((F.col("_elev") + F.lit(float(target_height))
            - F.col("p._oelev") - F.lit(float(observer_height)))
           / F.col("p.dist"))
    w = (Window.partitionBy("p._oid", "p.ray").orderBy("p.s")
         .rowsBetween(Window.unboundedPreceding, -1))
    horizon = F.max(ang).over(w)
    # an off-raster OBSERVER (unknown base elevation) yields NULL for
    # every sample — without the _oelev guard every angle is NULL, the
    # horizon stays NULL, and the isNull() arm would claim full
    # visibility (found in review)
    visible = F.when(F.col("p._oelev").isNull()
                     | F.col("_elev").isNull(),
                     F.lit(None).cast("boolean")) \
        .otherwise(horizon.isNull() | (ang > horizon))
    return (sampled
            .select(F.col("p._oid").alias(observer_id_col),
                    F.col("p.ray").alias("ray"), F.col("p.s").alias("s"),
                    F.col("p.lon").alias("lon"),
                    F.col("p.lat").alias("lat"),
                    F.col("p.dist").alias("dist"),
                    F.col("_elev").alias("elev"),
                    visible.alias("visible")))


def viewshed_counts(observers: DataFrame, tiles: DataFrame,
                    **kw) -> DataFrame:
    """Per-observer rollup: (observer_id, n_visible, n_samples,
    visible_fraction) — the site-selection statistic."""
    oid = kw.get("observer_id_col", "observer_id")
    vs = viewshed(observers, tiles, **kw)
    return (vs.groupBy(oid)
            .agg(F.sum(F.col("visible").cast("int")).alias("n_visible"),
                 F.count("visible").alias("n_samples"),
                 (F.sum(F.col("visible").cast("int"))
                  / F.count("visible")).alias("visible_fraction")))
