"""Spark-native bucketed co-location for repeated spatial joins.

The broadcast path (``operators/tag.py::tag_points``) assumes the polygon
layer fits one executor; the shuffle path re-exchanges BOTH sides on the
cell key every query. At 100 TB a national parcel/zone layer can exceed
broadcast size, and the same point stream is re-joined many times (tag,
overlay enrich, dwithin, per-zone rollups) — paying the cell shuffle per
query is the dominant cost. Spark's bucketed tables persist that shuffle
ONCE (the materialized-spatial-index layout, cf. spandex's PostGIS GiST
index per SURVEY.md §1.1: the DB maintains the index, queries reuse it):

- ``write_points_bucketed`` / ``write_polygons_bucketed`` stamp the cell
  key and write with ``bucketBy(n, "cell").sortBy("cell")``; rows of the
  same cell land in the same bucket file index on both tables.
- every later equi-join on ``cell`` between two tables bucketed with the
  SAME bucket count is EXCHANGE-FREE: SortMergeJoin reads aligned bucket
  pairs (``tests/test_bucketing.py`` asserts no ``Exchange`` in the plan
  with auto-broadcast disabled), and ``sortBy`` makes the per-bucket sort
  a cheap sorted-run merge.
- the polygon table stores one row per covering cell, classified by the
  quadkey index (``cover_cells_classified_udf``): interior (FULL) cells
  carry NULL geometry — at fine levels interior cells dominate, so the
  stored table stays small, Arrow ships nulls for the majority of
  candidate rows, and the exact-PIP kernel only computes on the boundary
  fringe (same two-phase contract as tag_points).

Scale notes: bucket count is a layout-time choice — pick ~(table size /
target partition size), same arithmetic as shuffle partitions; both
tables must use the same count. Skewed mega-cells are a WRITE-time
problem here (one bucket file gets the hot cell): level choice bounds
rows-per-cell exactly as in operators/skew.py, and the sortBy run keeps
the hot cell contiguous for the merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from spandex_spark import geom as _geom
from spandex_spark.functions.cells_sql import cell_of_expr
from spandex_spark.functions.spatial import _off, cover_cells_classified_udf


def write_bucketed(df: DataFrame, name: str, *, bucket_col: str = "cell",
                   n_buckets: int = 32, sort: bool = True,
                   path: str | None = None, mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted) on
    ``bucket_col``. ``path`` makes it external (tests write to tmp)."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def write_points_bucketed(points: DataFrame, name: str, *, level: int,
                          lon_col: str = "lon", lat_col: str = "lat",
                          n_buckets: int = 32,
                          path: str | None = None) -> None:
    """Stamp ``cell`` (quadkey at ``level``) and bucket-write the point
    stream. One codegen expression, one write-side shuffle — the LAST
    cell shuffle this stream ever pays."""
    pts = points.withColumn(
        "cell", cell_of_expr(F.col(lon_col), F.col(lat_col), level))
    write_bucketed(pts, name, n_buckets=n_buckets, path=path)


def write_polygons_bucketed(polygons: DataFrame, name: str, *,
                            poly_id_col: str, level: int,
                            n_buckets: int = 32,
                            path: str | None = None) -> None:
    """Explode the classified cell cover and bucket-write. FULL (interior)
    cells store NULL geometry — containment there is decided by the cell
    key alone; only boundary-cell rows carry rings for the exact refine."""
    cells = (polygons
             .select(F.col(poly_id_col).alias("_pid"), "geom")
             .withColumn("_cc", F.explode(
                 cover_cells_classified_udf(F.col("geom"), level)))
             .select(F.col("_pid"),
                     F.col("_cc.cell").alias("cell"),
                     F.when(~F.col("_cc.full"), F.col("geom")).alias("_bgeom")))
    write_bucketed(cells, name, n_buckets=n_buckets, path=path)


@pandas_udf(T.BooleanType())
def _pip_nullfull(lon: pd.Series, lat: pd.Series, xs: pd.Series,
                  ys: pd.Series, offs: pd.Series,
                  poly_id: pd.Series) -> pd.Series:
    """Exact PIP with the FULL-cell shortcut encoded as NULL geometry:
    rows whose rings are NULL are interior-cell hits and accept without
    computing; boundary rows vectorize per distinct polygon in the batch
    (same geom.pip_pairs contract as functions/spatial.py::_pip)."""
    n = len(poly_id)
    full = np.fromiter((xs.iloc[i] is None for i in range(n)), bool, n)
    if full.all():
        return pd.Series(np.ones(n, bool))
    ids = poly_id.to_numpy(np.int64)
    polys: dict[int, tuple] = {}
    for i in range(n):
        if full[i]:
            continue
        pid = ids[i]
        if pid not in polys:
            polys[pid] = (np.asarray(xs.iloc[i], np.float64),
                          np.asarray(ys.iloc[i], np.float64),
                          _off(offs.iloc[i]))
    bnd = ~full
    out = np.ones(n, bool)
    out[bnd] = _geom.pip_pairs(lon.to_numpy(np.float64)[bnd],
                               lat.to_numpy(np.float64)[bnd],
                               ids[bnd], polys)
    return pd.Series(out)


def tag_points_bucketed(spark: SparkSession, points_table: str,
                        polygons_table: str, *, poly_id_col: str,
                        point_id_col: str,
                        assume_disjoint: bool = False) -> DataFrame:
    """tag_points over two pre-bucketed tables: the cell join is
    exchange-free (aligned buckets), the refine kernel sees geometry only
    for boundary-fringe rows. With ``assume_disjoint`` the whole tag is
    ZERO-shuffle end-to-end; overlapping layers pay one winner shuffle on
    the point id (min-poly-id resolution, same semantics as tag_points)."""
    pts = spark.table(points_table)
    pol = spark.table(polygons_table)
    cand = pts.join(pol, "cell", "inner")
    g = F.col("_bgeom")
    hits = cand.filter(_pip_nullfull(
        F.col("lon"), F.col("lat"), g["xs"], g["ys"], g["ring_offsets"],
        F.col("_pid"))).drop("_bgeom")
    point_cols = [c for c in pts.columns if c != "cell"]
    if assume_disjoint:
        return hits.select(*point_cols, F.col("_pid").alias(poly_id_col))
    winners = hits.groupBy(point_id_col).agg(
        F.min("_pid").alias(poly_id_col))
    return pts.drop("cell").join(winners, point_id_col, "left")
