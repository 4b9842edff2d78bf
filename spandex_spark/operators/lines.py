"""Linestring operators: length and nearest-line join.

Reference semantics: PostGIS handles LINESTRING features (roads, transit
networks) transparently in spandex's SQL templates — ST_Length, the `<->`
KNN operator against line layers (spandex/spatialtoolz.py delegates all
geometry types to PostGIS). Here lines use the same struct-of-arrays
encoding (kind=2; ``ring_offsets`` delimits multi-part lines, parts OPEN).

Nearest-line join follows the kernel pattern of operators/knn.py: the line
layer is collected once (broadcast-sized by contract — road networks per
partition/region, not per point) and closed over a mapInPandas scan; each
Arrow batch computes a vectorized point-to-segment distance matrix. No
join, no shuffle on the point stream; the window top-k only sees
candidates. The big-both-sides path is cover_linestring cells + the same
histogram plan as knn cells — recorded as the scale follow-up.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from spandex_spark import geom as _geom


def line_length(df: DataFrame, *, geom_col: str = "geom",
                out_col: str = "length", metric: str = "planar") -> DataFrame:
    """ST_Length analog over linestring geometries."""

    @pandas_udf(T.DoubleType())
    def _len(xs: pd.Series, ys: pd.Series, offs: pd.Series) -> pd.Series:
        out = np.empty(len(xs))
        for i in range(len(xs)):
            o = offs.iloc[i]
            out[i] = _geom.linestring_length(
                np.asarray(xs.iloc[i], np.float64),
                np.asarray(ys.iloc[i], np.float64),
                np.asarray(o, np.int64) if o is not None and len(o) > 2 else None,
                metric=metric)
        return pd.Series(out)

    g = F.col(geom_col)
    return df.withColumn(out_col, _len(g["xs"], g["ys"], g["ring_offsets"]))


def nearest_line_join(points: DataFrame, lines: DataFrame, *, k: int,
                      point_id_col: str, line_id_col: str,
                      lon_col: str = "lon", lat_col: str = "lat",
                      geom_col: str = "geom") -> DataFrame:
    """k nearest linestrings per point (planar degrees; ties broken by
    (dist, line_id)). Returns (point_id, rank, line_id, dist_deg)."""
    rows = lines.select(F.col(line_id_col).alias("_lid"),
                        F.col(geom_col).alias("_g")).collect()
    entries = []
    for r in rows:
        o = r["_g"]["ring_offsets"]
        entries.append((int(r["_lid"]),
                        np.asarray(r["_g"]["xs"], np.float64),
                        np.asarray(r["_g"]["ys"], np.float64),
                        np.asarray(o, np.int64) if o is not None and len(o) > 2 else None))
    entries.sort(key=lambda e: e[0])
    lids = np.array([e[0] for e in entries], dtype=np.int64)
    kk = min(k, len(entries))

    schema = T.StructType([
        T.StructField("p", T.LongType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("lid", T.LongType()),
        T.StructField("dist_deg", T.DoubleType()),
    ])

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            px = pdf[lon_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            d = np.empty((n, len(entries)))
            for j, (_, xs, ys, offs) in enumerate(entries):
                d[:, j] = _geom.points_to_linestring_dist(px, py, xs, ys, offs)
            sel = np.lexsort((np.broadcast_to(lids, d.shape), d), axis=1)[:, :kk]
            yield pd.DataFrame({
                "p": np.repeat(pdf[point_id_col].to_numpy(np.int64), kk),
                "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32), n),
                "lid": lids[sel.ravel()],
                "dist_deg": np.take_along_axis(d, sel, axis=1).ravel(),
            })

    out = points.select(point_id_col, lon_col, lat_col).mapInPandas(
        scan, schema=schema)
    return out.select(F.col("p").alias(point_id_col), "rank",
                      F.col("lid").alias(line_id_col), "dist_deg")
