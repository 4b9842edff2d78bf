"""O7 — raster↔vector zonal extraction.

Reference semantics: spandex/rastertoolz.py (from_geotiff/to_matrix/
clip2shp + rasterstats-style zonal_stats(vectors, raster, stats)). Rebuilt
Spark-native: the raster is a TILE TABLE (tile_id, x0, y0, res, nx, ny,
values row-major) — tiles join to zones on coarse cells, then a grouped
Arrow kernel computes PARTIAL stats (count/sum/sumsq/min/max) of the pixels
of each (tile, zone) pair via a vectorized pixel-center-in-polygon mask;
a final hash aggregation combines partials per zone. Map-side-partial →
reduce shape: the pixel data never shuffles, only (zone, partial) rows do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spandex_spark import geom as _geom
from spandex_spark.functions.spatial import cover_cells_udf
from spandex_spark import cells as _cells

_PARTIAL_SCHEMA = T.StructType([
    T.StructField("zone_id", T.LongType()),
    T.StructField("cnt", T.LongType()),
    T.StructField("s", T.DoubleType()),
    T.StructField("s2", T.DoubleType()),
    T.StructField("mn", T.DoubleType()),
    T.StructField("mx", T.DoubleType()),
])


def zonal_stats(tiles: DataFrame, zones: DataFrame, *,
                zone_id_col: str = "zone_id", level: int = 7,
                broadcast_zones: bool = True) -> DataFrame:
    """Per-zone count/sum/mean/min/max/stddev of raster pixel values whose
    pixel CENTER falls in the zone (rasterstats default semantics)."""
    zc = (zones.select(F.col(zone_id_col).alias("_zid"), "geom")
          .withColumn("cell", F.explode(cover_cells_udf(F.col("geom"), level))))
    if broadcast_zones:
        zc = F.broadcast(zc)

    tc = tiles.withColumn("cell", F.explode(_tile_cells_udf(
        F.col("x0"), F.col("y0"), F.col("res"), F.col("nx"), F.col("ny"),
        F.lit(level))))

    pairs = tc.join(zc, "cell", "inner").dropDuplicates(["tile_id", "_zid"])

    def compute_partials(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, row in pdf.iterrows():
            vals = np.asarray(row["values"], np.float64)
            nx, ny, res = int(row["nx"]), int(row["ny"]), float(row["res"])
            px = float(row["x0"]) + (np.arange(nx) + 0.5) * res
            py = float(row["y0"]) + (np.arange(ny) + 0.5) * res
            lon, lat = np.meshgrid(px, py)
            lon, lat = lon.ravel(), lat.ravel()
            xs = np.asarray(row["geom"]["xs"], np.float64)
            ys = np.asarray(row["geom"]["ys"], np.float64)
            mask = _geom.points_in_polygon(lon, lat, xs, ys)
            if not mask.any():
                continue
            v = vals[mask]
            rows.append((int(row["_zid"]), int(v.shape[0]), float(v.sum()),
                         float((v * v).sum()), float(v.min()), float(v.max())))
        return pd.DataFrame(rows, columns=["zone_id", "cnt", "s", "s2", "mn", "mx"])

    partials = pairs.groupBy("tile_id", "_zid").applyInPandas(
        compute_partials, schema=_PARTIAL_SCHEMA)

    out = (partials.groupBy("zone_id")
           .agg(F.sum("cnt").alias("px_count"),
                F.sum("s").alias("px_sum"),
                F.min("mn").alias("px_min"),
                F.max("mx").alias("px_max"),
                (F.sum("s") / F.sum("cnt")).alias("px_mean"),
                F.sqrt(F.sum("s2") / F.sum("cnt")
                       - (F.sum("s") / F.sum("cnt")) ** 2).alias("px_std")))
    return out.withColumnRenamed("zone_id", zone_id_col)


from pyspark.sql.functions import pandas_udf  # noqa: E402


@pandas_udf(T.ArrayType(T.LongType()))
def _tile_cells_udf(x0: pd.Series, y0: pd.Series, res: pd.Series,
                    nx: pd.Series, ny: pd.Series, level: pd.Series) -> pd.Series:
    lvl = int(level.iloc[0])
    out = []
    for i in range(len(x0)):
        w = float(res.iloc[i]) * int(nx.iloc[i])
        h = float(res.iloc[i]) * int(ny.iloc[i])
        c = _cells.cover_bbox(float(x0.iloc[i]), float(y0.iloc[i]),
                              float(x0.iloc[i]) + w, float(y0.iloc[i]) + h, lvl)
        out.append(c.tolist())
    return pd.Series(out)
