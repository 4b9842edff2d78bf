"""O3 — kNN nearest-feature join.

Reference semantics: the PostGIS `<->` KNN-GiST order-by (nearest source
feature per target geometry; spandex's nearest-feature helper). Two Spark
strategies:

* ``broadcast`` (feature side fits in memory — the spandex-typical shape:
  POIs/stops vs parcels): broadcast cross join with the distance computed
  by JVM built-ins (stays inside whole-stage codegen; zero Python), then
  ``row_number() over (partition by query order by dist, id) <= k``.
* ``cells`` (both sides large): grid ring expansion — join queries to
  feature cells at ring r, grow r until every query holds >= k candidates
  within a *verified* radius (kth distance <= r * min cell extent), union
  rounds, then the same window top-k. Exact, shuffle-bounded, no cross
  product.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spandex_spark.functions.spatial import cell_of_udf, haversine_udf
from spandex_spark import cells as _cells

EARTH_RADIUS_M = 6_371_008.8


def haversine_expr(lon1, lat1, lon2, lat2):
    """Great-circle meters via JVM built-ins (codegen-friendly)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2) - F.radians(lat1)
    dlon = F.radians(lon2) - F.radians(lon1)
    h = F.sin(dlat / 2) ** 2 + F.cos(rl1) * F.cos(rl2) * F.sin(dlon / 2) ** 2
    return 2.0 * EARTH_RADIUS_M * F.asin(F.sqrt(h))


def knn_join(queries: DataFrame, features: DataFrame, *, k: int,
             query_id_col: str, feature_id_col: str,
             q_lon: str = "lon", q_lat: str = "lat",
             f_lon: str = "lon", f_lat: str = "lat",
             strategy: str = "broadcast", level: int = 7,
             max_rings: int = 64, metric: str = "haversine") -> DataFrame:
    """k nearest features per query point. Ties broken by (dist, feature_id).

    ``metric``: 'haversine' (meters, great-circle — the default) or
    'planar' (squared lon/lat degrees — exact FP-reproducible arithmetic,
    used where results must be bit-comparable to an external SQL oracle).
    Returns (query_id, rank, feature_id, dist_m).
    """
    q = queries.select(F.col(query_id_col).alias("_qid"),
                       F.col(q_lon).alias("_qlon"), F.col(q_lat).alias("_qlat"))
    f = features.select(F.col(feature_id_col).alias("_fid"),
                        F.col(f_lon).alias("_flon"), F.col(f_lat).alias("_flat"))

    if strategy == "kernel":
        return _knn_kernel(q, f, k=k, query_id_col=query_id_col,
                           feature_id_col=feature_id_col, metric=metric)
    if strategy == "broadcast":
        cand = q.crossJoin(F.broadcast(f))
    elif strategy == "cells":
        cand = _ring_candidates(q, f, k=k, level=level, max_rings=max_rings)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    if metric == "haversine":
        dist = haversine_expr(F.col("_qlon"), F.col("_qlat"),
                              F.col("_flon"), F.col("_flat"))
    elif metric == "planar":
        dx = F.col("_flon") - F.col("_qlon")
        dy = F.col("_flat") - F.col("_qlat")
        dist = dx * dx + dy * dy
    else:
        raise ValueError(f"unknown metric {metric!r}")
    cand = cand.withColumn("dist_m", dist)
    if k == 1:
        # k=1 fast path: min_by hash-aggregates with map-side partials (a
        # min-of-struct would fall back to SortAggregate) — the shuffle
        # carries one row per (query, partition), not the whole candidate
        # set. Ordering struct (dist, fid) keeps the tie-break exact.
        order = F.struct("dist_m", "_fid")
        best = (cand.groupBy("_qid")
                .agg(F.min_by("_fid", order).alias("_bfid"),
                     F.min("dist_m").alias("_bdist")))
        return best.select(F.col("_qid").alias(query_id_col),
                           F.lit(1).alias("rank"),
                           F.col("_bfid").alias(feature_id_col),
                           F.col("_bdist").alias("dist_m"))
    w = Window.partitionBy("_qid").orderBy(F.col("dist_m").asc(), F.col("_fid").asc())
    out = (cand.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k))
    return out.select(F.col("_qid").alias(query_id_col), "rank",
                      F.col("_fid").alias(feature_id_col), "dist_m")


def _knn_kernel(q: DataFrame, f: DataFrame, *, k: int, query_id_col: str,
                feature_id_col: str, metric: str) -> DataFrame:
    """Small-feature-side fast path: features collected once (broadcast-
    sized by contract, like a POI/stop layer) and closed over a mapInPandas
    scan of the query stream — one (B x M) numpy distance matrix per Arrow
    batch, no M-way row fan-out, no shuffle at all. Exact."""
    from collections.abc import Iterator
    from pyspark.sql import types as T
    from spandex_spark.geom import haversine_m

    frows = f.collect()
    fids = np.array([r["_fid"] for r in frows], dtype=np.int64)
    flon = np.array([r["_flon"] for r in frows], dtype=np.float64)
    flat = np.array([r["_flat"] for r in frows], dtype=np.float64)
    kk = min(k, fids.shape[0])

    schema = T.StructType([
        T.StructField("q", T.LongType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("fid", T.LongType()),
        T.StructField("dist_m", T.DoubleType()),
    ])

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            qlon = pdf["_qlon"].to_numpy(np.float64)
            qlat = pdf["_qlat"].to_numpy(np.float64)
            if metric == "haversine":
                d = haversine_m(qlon[:, None], qlat[:, None],
                                flon[None, :], flat[None, :])
            else:
                d = ((flon[None, :] - qlon[:, None]) ** 2
                     + (flat[None, :] - qlat[:, None]) ** 2)
            # exact (dist, fid) tie-break: full lexsort — M is broadcast-sized
            sel = np.lexsort((np.broadcast_to(fids, d.shape), d), axis=1)[:, :kk]
            yield pd.DataFrame({
                "q": np.repeat(pdf["_qid"].to_numpy(np.int64), kk),
                "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32), n),
                "fid": fids[sel.ravel()],
                "dist_m": np.take_along_axis(d, sel, axis=1).ravel(),
            })

    out = q.mapInPandas(scan, schema=schema)
    return out.select(F.col("q").alias(query_id_col), "rank",
                      F.col("fid").alias(feature_id_col), "dist_m")


def nearest_feature_column(features: DataFrame, *, feature_id_col: str,
                           f_lon: str = "lon", f_lat: str = "lat",
                           metric: str = "haversine"):
    """Column factory for the fused pipeline: ``col = nearest(lon, lat)``
    returns struct(feature_id, dist_m) of the nearest feature, computed as
    one numpy distance matrix per Arrow batch against the collected
    (broadcast-sized) feature set. Lets tag+kNN run as a single scan with
    no join on the point stream."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf
    from spandex_spark.geom import haversine_m

    frows = features.select(feature_id_col, f_lon, f_lat).collect()
    fids = np.array([r[0] for r in frows], dtype=np.int64)
    flon = np.array([r[1] for r in frows], dtype=np.float64)
    flat = np.array([r[2] for r in frows], dtype=np.float64)

    out_type = T.StructType([T.StructField("feature_id", T.LongType()),
                             T.StructField("dist_m", T.DoubleType())])

    @pandas_udf(out_type)
    def _nearest(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        if len(lon) == 0:
            return pd.DataFrame({"feature_id": [], "dist_m": []})
        qlon = lon.to_numpy(np.float64)
        qlat = lat.to_numpy(np.float64)
        if metric == "haversine":
            d = haversine_m(qlon[:, None], qlat[:, None],
                            flon[None, :], flat[None, :])
        else:
            d = ((flon[None, :] - qlon[:, None]) ** 2
                 + (flat[None, :] - qlat[:, None]) ** 2)
        # argmin with (dist, fid) tie-break: fids are sorted-stable via lexsort
        sel = np.lexsort((np.broadcast_to(fids, d.shape), d), axis=1)[:, 0]
        return pd.DataFrame({"feature_id": fids[sel],
                             "dist_m": np.take_along_axis(
                                 d, sel[:, None], axis=1).ravel()})

    return _nearest


def _ring_candidates(q: DataFrame, f: DataFrame, *, k: int, level: int,
                     max_rings: int) -> DataFrame:
    """Grid ring expansion: candidates within Chebyshev cell-ring r of each
    query, r grown until the kth-NN distance is provably covered."""
    spark = q.sparkSession
    fc = f.withColumn("_fcell", cell_of_udf(F.col("_flon"), F.col("_flat"), level))
    qc = (q.withColumn("_qcell", cell_of_udf(F.col("_qlon"), F.col("_qlat"), level))
          .persist())
    # min ground extent of one cell (lat direction is constant; lon shrinks
    # with cos(lat) — use lat extent, the safe lower bound of ring distance)
    lat_extent_m = 180.0 / (1 << level) * 111_194.9
    fc = fc.persist()

    unresolved = qc
    gathered = None
    r = 0
    while True:
        ring_cells = _ring_cells_udf(F.col("_qcell"), F.lit(r))
        cand_r = (unresolved.withColumn("_cell", F.explode(ring_cells))
                  .join(fc.withColumnRenamed("_fcell", "_cell"), "_cell", "inner")
                  .drop("_cell"))
        gathered = cand_r if gathered is None else gathered.unionByName(cand_r)
        # a query is resolved when it has >= k candidates whose kth distance
        # is within the radius guaranteed covered by ring r
        dist = haversine_expr(F.col("_qlon"), F.col("_qlat"),
                              F.col("_flon"), F.col("_flat"))
        covered_m = max(r, 0) * lat_extent_m
        wk = Window.partitionBy("_qid").orderBy(dist.asc())
        kth = (gathered.withColumn("_rn", F.row_number().over(wk))
               .filter(F.col("_rn") == k)
               .withColumn("_kd", dist)
               .select("_qid", "_kd"))
        resolved_ids = kth.filter(F.col("_kd") <= covered_m).select("_qid")
        prev_unresolved = unresolved
        unresolved = unresolved.join(resolved_ids, "_qid", "left_anti").persist()
        unresolved.count()  # materialize before dropping the parent
        if prev_unresolved is not qc:
            prev_unresolved.unpersist()
        r += 1
        if r > max_rings or unresolved.isEmpty():
            break
        gathered = gathered.persist()
    qc.unpersist()
    fc.unpersist()
    unresolved.unpersist()
    return gathered.dropDuplicates(["_qid", "_fid"])


from pyspark.sql import types as T  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402
import pandas as pd  # noqa: E402


@pandas_udf(T.ArrayType(T.LongType()))
def _ring_cells_udf(cell: pd.Series, ring: pd.Series) -> pd.Series:
    """Cells at Chebyshev ring exactly r around each cell (r=0 → the cell)."""
    r = int(ring.iloc[0])
    carr = cell.to_numpy(np.int64)
    lvl = int(_cells.cell_level(carr[:1])[0]) if carr.shape[0] else 0
    n = 1 << lvl
    gx, gy = _cells.cell_xy(carr)
    out = []
    if r == 0:
        return pd.Series([[int(c)] for c in carr])
    offsets = [(dx, dy) for dx in range(-r, r + 1) for dy in range(-r, r + 1)
               if max(abs(dx), abs(dy)) == r]
    dxs = np.array([o[0] for o in offsets])
    dys = np.array([o[1] for o in offsets])
    for i in range(carr.shape[0]):
        xs = gx[i] + dxs
        ys = gy[i] + dys
        ok = (xs >= 0) & (xs < n) & (ys >= 0) & (ys < n)
        out.append(_cells.xy_to_cell(xs[ok], ys[ok], lvl).tolist())
    return pd.Series(out)
