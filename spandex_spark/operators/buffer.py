"""Point buffering — the ST_Buffer(point, r) analog.

Reference semantics: PostGIS `ST_Buffer` produces an n-segment circle
approximation around each point (quad_segs × 4 vertices); the reference's
SQL templates use it for "features within distance" staging and for
visual/area products. Here the polygon is generated ENTIRELY inside JVM
codegen: ``transform(sequence(0, n-1), i -> center + r·(cos, sin)(2πi/n))``
— no Python, no UDF, one projection. Output is the engine's standard
struct-of-arrays geometry (kind=3, CCW ring, bbox), so buffers flow
directly into tag/overlay/trim/zonal.

``radius`` may be a Column (per-row radii). metric='planar' buffers in
degrees; 'haversine' takes meters and stretches longitude by 1/cos(lat)
(the small-circle approximation every planar-buffer-on-geography tool
makes; exact geodesic buffering is a different operator class). Buffers
crossing the antimeridian or poles are not re-split — the caller clips.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spandex_spark.geom import EARTH_RADIUS_M

_DEG_M = EARTH_RADIUS_M * math.pi / 180.0


def buffer_points(df: DataFrame, *, radius, segments: int = 16,
                  lon_col: str = "lon", lat_col: str = "lat",
                  metric: str = "planar", out_col: str = "geom") -> DataFrame:
    """Append an n-gon buffer polygon column around each (lon, lat) row."""
    if metric not in ("planar", "haversine"):
        raise ValueError(f"unknown metric {metric!r}")
    if segments < 3:
        raise ValueError("segments must be >= 3")
    r = radius if isinstance(radius, Column) else F.lit(float(radius))
    lon, lat = F.col(lon_col), F.col(lat_col)
    if metric == "haversine":
        ry = r / F.lit(_DEG_M)
        rx = ry / F.cos(F.radians(lat))
    else:
        rx = ry = r
    step = 2.0 * math.pi / segments
    i = F.sequence(F.lit(0), F.lit(segments - 1))
    xs = F.transform(i, lambda k: lon + rx * F.cos(k.cast("double")
                                                  * F.lit(step)))
    ys = F.transform(i, lambda k: lat + ry * F.sin(k.cast("double")
                                                   * F.lit(step)))
    geom = F.struct(
        F.lit(3).cast("tinyint").alias("kind"),
        xs.alias("xs"), ys.alias("ys"),
        F.array(F.lit(0), F.lit(segments)).alias("ring_offsets"),
        F.struct((lon - rx).alias("minx"), (lat - ry).alias("miny"),
                 (lon + rx).alias("maxx"), (lat + ry).alias("maxy"))
        .alias("bbox"))
    return df.withColumn(out_col, geom)
