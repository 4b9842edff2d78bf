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


LAT_DEG_M = 111_194.9  # meters per degree of latitude (mean sphere)


class _CellHistogram:
    """Driver-side index of the feature layer's non-empty cells at one
    level: dense count grid + 2D prefix sums (O(1) box counts, x-wrapped
    across the antimeridian) + the non-empty cell coordinate list. Bounded
    by 4^level regardless of feature count — the same broadcast-sized-
    by-contract shape as PolygonIndex (the reference's GiST build)."""

    def __init__(self, gx: np.ndarray, gy: np.ndarray, counts: np.ndarray,
                 level: int):
        self.level = level
        self.n = 1 << level
        n = self.n
        grid = np.zeros((n, n), dtype=np.int64)  # [y, x]
        grid[gy, gx] = counts
        self.grid = grid
        # prefix[y, x] = sum of grid[:y, :x]
        self.prefix = np.zeros((n + 1, n + 1), dtype=np.int64)
        np.cumsum(np.cumsum(grid, axis=0), axis=1, out=self.prefix[1:, 1:])
        self.total = int(counts.sum())
        self.ne_x = gx.astype(np.int64)
        self.ne_y = gy.astype(np.int64)

    def _col_range_count(self, y0, y1, x0, x1):
        """Box count over y in [y0, y1] (clipped), x in [x0, x1] (NOT
        wrapped; caller pre-splits). All args vectorized."""
        y0 = np.clip(y0, 0, self.n - 1)
        y1 = np.clip(y1, 0, self.n - 1)
        x0c = np.clip(x0, 0, self.n - 1)
        x1c = np.clip(x1, 0, self.n - 1)
        empty = (x1 < 0) | (x0 > self.n - 1) | (x1c < x0c) | (y1 < y0)
        p = self.prefix
        c = (p[y1 + 1, x1c + 1] - p[y0, x1c + 1]
             - p[y1 + 1, x0c] + p[y0, x0c])
        return np.where(empty, 0, c)

    def box_count(self, gx, gy, rx, ry):
        """Features within wrapped-x distance <= rx and y distance <= ry of
        each (gx, gy). Vectorized; lon wraps (antimeridian), lat clips."""
        gx = np.asarray(gx)
        gy = np.asarray(gy)
        y0, y1 = gy - ry, gy + ry
        full_x = 2 * np.asarray(rx) + 1 >= self.n
        x0 = gx - rx
        x1 = gx + rx
        # wrapped box = up to two unwrapped column ranges
        a = self._col_range_count(y0, y1, np.maximum(x0, 0),
                                  np.minimum(x1, self.n - 1))
        b = np.where(x0 < 0,
                     self._col_range_count(y0, y1, x0 + self.n, np.full_like(x0, self.n - 1)),
                     np.where(x1 > self.n - 1,
                              self._col_range_count(y0, y1, np.zeros_like(x1), x1 - self.n),
                              0))
        whole = self._col_range_count(y0, y1, np.zeros_like(x0),
                                      np.full_like(x0, self.n - 1))
        return np.where(full_x, whole, a + b)

    def cells_in_box(self, gx: int, gy: int, rx: int, ry: int) -> np.ndarray:
        """Non-empty cell ids within the (wrapped-x, clipped-y) box of one
        query cell. Two tiers: enumerate the block when it is smaller than
        the non-empty list, else scan the non-empty list."""
        n = self.n
        block = (2 * min(rx, n // 2) + 1) * (2 * ry + 1)
        if block <= self.ne_x.shape[0]:
            xs = (np.arange(gx - rx, gx + rx + 1) % n)
            if 2 * rx + 1 >= n:
                xs = np.arange(n)
            else:
                xs = np.unique(xs)
            ys = np.arange(max(0, gy - ry), min(n - 1, gy + ry) + 1)
            xx, yy = np.meshgrid(xs, ys)
            xx, yy = xx.ravel(), yy.ravel()
            keep = self.grid[yy, xx] > 0
            return _cells.xy_to_cell(xx[keep], yy[keep], self.level)
        dx = np.abs(self.ne_x - gx)
        dx = np.minimum(dx, n - dx)  # wrapped lon distance
        keep = (dx <= rx) & (np.abs(self.ne_y - gy) <= ry)
        return _cells.xy_to_cell(self.ne_x[keep], self.ne_y[keep], self.level)


def _search_radii(hist: _CellHistogram, gx: np.ndarray, gy: np.ndarray,
                  k: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact per-query-cell search boxes (rx, ry) guaranteeing the true kNN
    set is inside, VECTORIZED over all distinct query cells at once:
    (1) find a Chebyshev radius r whose box holds >= k features
    (exponential ladder on the O(1) prefix-sum box counts), (2) bound the
    kth distance d_up from above, (3) convert d_up back to cell radii with
    latitude-aware LOWER bounds on cell ground extent (a lon cell spans
    2*cos(lat)*lat_extent meters — SMALLER than the lat extent above
    60 deg, so using the lat extent as 'min extent' under-covers there)."""
    n = hist.n
    lat_ext_deg = 180.0 / n
    lat_ext_m = lat_ext_deg * LAT_DEG_M
    m = gx.shape[0]
    if hist.total <= k:
        full = np.full(m, n, dtype=np.int64)
        return full, full.copy()  # degenerate: take every feature cell
    # exponential ladder; overshooting r only adds candidates (still exact)
    r = np.zeros(m, dtype=np.int64)
    idx = np.flatnonzero(hist.box_count(gx, gy, r, r) < k)
    while idx.size:
        r[idx] = np.minimum(n, np.where(r[idx] == 0, 1, r[idx] * 2))
        cnt = hist.box_count(gx[idx], gy[idx], r[idx], r[idx])
        idx = idx[(cnt < k) & (r[idx] < n)]
    # upper bound on kth-NN distance: meridional leg + parallel leg at the
    # most equatorward latitude reachable within the box
    lat_lo = np.abs(gy * lat_ext_deg - 90.0)
    lat_hi = np.abs((gy + 1) * lat_ext_deg - 90.0)
    band_min = np.maximum(0.0, np.minimum(lat_lo, lat_hi)
                          - (r + 1) * lat_ext_deg)
    d_up = (r + 1) * lat_ext_m * (1.0 + 2.0 * np.cos(np.radians(band_min)))
    # y radius: great-circle distance >= meridional separation
    ry = np.minimum(n, np.ceil(d_up / lat_ext_m).astype(np.int64))
    # x radius: distance >= (4/pi)*cos(band_max_abs)*lat_ext_m per lon cell,
    # with band_max_abs taken over every latitude reachable within ry
    band_max = np.minimum(90.0, np.maximum(lat_lo, lat_hi)
                          + (ry + 1) * lat_ext_deg)
    per_cell = (4.0 / np.pi) * np.cos(np.radians(band_max)) * lat_ext_m
    safe = np.where(per_cell > 0.0, per_cell, 1.0)
    rx = np.where(per_cell <= d_up / n,  # polar: cover all longitudes
                  n, np.minimum(float(n), np.ceil(d_up / safe))).astype(np.int64)
    return rx, ry


def _candidate_cells_udf(hist: _CellHistogram, k: int):
    """Per-query candidate cell list (array<long>): all non-empty feature
    cells within the exact per-query-cell search box. Computed once per
    DISTINCT query cell per Arrow batch and fanned back to rows."""

    @pandas_udf(T.ArrayType(T.LongType()))
    def _cand(lon: pd.Series, lat: pd.Series) -> pd.Series:
        if len(lon) == 0:
            return pd.Series([], dtype=object)
        gx, gy = _cells.grid_coords(lon.to_numpy(np.float64),
                                    lat.to_numpy(np.float64), hist.level)
        key = gx * np.int64(hist.n) + gy
        uniq, inverse = np.unique(key, return_inverse=True)
        ux = (uniq // hist.n).astype(np.int64)
        uy = (uniq % hist.n).astype(np.int64)
        rx, ry = _search_radii(hist, ux, uy, k)  # one vectorized pass
        lists: list[list[int]] = []
        for j in range(uniq.shape[0]):
            lists.append(hist.cells_in_box(int(ux[j]), int(uy[j]),
                                           int(rx[j]), int(ry[j])).tolist())
        return pd.Series([lists[i] for i in inverse])

    return _cand


def _ring_candidates(q: DataFrame, f: DataFrame, *, k: int, level: int,
                     max_rings: int) -> DataFrame:
    """Cells-strategy candidate pairs in exactly TWO Spark jobs (the round-1
    version looped count()/isEmpty() actions per ring and re-windowed a
    growing union — O(rings) sequential jobs):

    job 1  feature cell histogram (groupBy(cell).count() → driver; bounded
           by 4^level non-empty cells, not by feature count);
    job 2  queries emit their candidate cells from the histogram closure
           (one pandas UDF, computed per distinct query cell), explode,
           hash-join the feature side on cell. The caller's window top-k
           runs in the same job.

    Exact: the per-query search box provably contains the true kNN set
    (latitude-aware bounds, lon wraps at the antimeridian, polar queries
    degrade to all-longitude coverage). ``max_rings`` is retained for
    signature compatibility but no longer bounds correctness.
    """
    if level > 11:
        raise ValueError("cells strategy supports level <= 11 "
                         "(dense histogram grid)")
    fc = f.withColumn("_cell", _cell_of_jvm(F.col("_flon"), F.col("_flat"), level))
    rows = fc.groupBy("_cell").count().collect()
    carr = np.array([r["_cell"] for r in rows], dtype=np.int64)
    cnts = np.array([r["count"] for r in rows], dtype=np.int64)
    gx, gy = _cells.cell_xy(carr) if carr.shape[0] else (np.array([], np.int64),) * 2
    hist = _CellHistogram(gx, gy, cnts, level)
    cand_cells = _candidate_cells_udf(hist, k)
    qc = (q.withColumn("_cell", F.explode(cand_cells(F.col("_qlon"),
                                                     F.col("_qlat")))))
    return qc.join(fc, "_cell", "inner").drop("_cell")


def _cell_of_jvm(lon, lat, level: int):
    from spandex_spark.functions.cells_sql import cell_of_expr
    return cell_of_expr(lon, lat, level)


from pyspark.sql import types as T  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402
import pandas as pd  # noqa: E402
