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
from spandex_spark.geom import EARTH_RADIUS_M


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
    if metric not in ("haversine", "planar"):
        raise ValueError(f"unknown metric {metric!r}")
    if strategy == "broadcast":
        cand = q.crossJoin(F.broadcast(f))
    elif strategy == "cells":
        # metric matters here: the search-box derivation must bound the
        # kth distance under the SAME metric the ranking uses (ADVICE r2)
        cand = _ring_candidates(q, f, k=k, level=level, max_rings=max_rings,
                                metric=metric)
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
    if "_dmax" in cand.columns:
        # per-query-cell kth-distance upper bound from the cells-route
        # prune (linear units; the planar metric ranks by SQUARED
        # distance, so compare against D^2 there). Exact: true top-k
        # distances are all <= D, so the filter only sheds non-winners
        # before the top-k sort.
        bound = (F.col("_dmax") * F.col("_dmax") if metric == "planar"
                 else F.col("_dmax"))
        cand = cand.filter(F.col("dist_m") <= bound).drop("_dmax")
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
    # Pre-partition the window exchange at the cluster's core count: the
    # top-k exchange carries few bytes, so block count — M x R — not
    # partition size is its cost (guide §2.2: fewer, larger reduce
    # partitions; scale-adaptive, no constant baked in). The window
    # reuses the repartition's hash partitioning — still ONE exchange.
    from spandex_spark.functions.partitioning import pre_group_repartition
    w = Window.partitionBy("_qid").orderBy(F.col("dist_m").asc(), F.col("_fid").asc())
    out = (pre_group_repartition(cand, "_qid")
           .withColumn("rank", F.row_number().over(w))
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

    frows = f.collect()  # collect-ok: feature side broadcast-sized by contract (kernel strategy)
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

    frows = features.select(feature_id_col, f_lon, f_lat).collect()  # collect-ok: feature side broadcast-sized by contract (fused column)
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
    """Radius oracle over the feature layer's cell counts at a COARSE level
    (<= _HIST_MAX_LEVEL): dense count grid CROPPED to the occupied cell
    bbox + 2D prefix sums (O(1) box counts; x optionally wraps at the
    antimeridian). Memory is O(occupied extent), not O(4^level), and the
    structure ships to executors as a Spark broadcast (round 2 pickled a
    full 4^level grid into every task closure — ~67 MB at level 11)."""

    def __init__(self, gx: np.ndarray, gy: np.ndarray, counts: np.ndarray,
                 level: int):
        self.level = level
        self.n = 1 << level
        if gx.shape[0]:
            self.x_off = int(gx.min())
            self.y_off = int(gy.min())
            w = int(gx.max()) - self.x_off + 1
            h = int(gy.max()) - self.y_off + 1
        else:
            self.x_off = self.y_off = 0
            w = h = 1
        grid = np.zeros((h, w), dtype=np.int64)  # [y, x], window coords
        if gx.shape[0]:
            grid[gy - self.y_off, gx - self.x_off] = counts
        self.h, self.w = h, w
        # prefix[y, x] = sum of grid[:y, :x]
        self.prefix = np.zeros((h + 1, w + 1), dtype=np.int64)
        np.cumsum(np.cumsum(grid, axis=0), axis=1, out=self.prefix[1:, 1:])
        self.total = int(counts.sum())

    def _window_count(self, y0, y1, x0, x1):
        """Count over y in [y0, y1], x in [x0, x1] (inclusive, global grid
        coords, NOT wrapped; caller pre-splits). Vectorized; ranges outside
        the occupied window contribute 0."""
        ylo = np.clip(np.asarray(y0) - self.y_off, 0, self.h)
        yhi = np.clip(np.asarray(y1) - self.y_off + 1, 0, self.h)
        xlo = np.clip(np.asarray(x0) - self.x_off, 0, self.w)
        xhi = np.clip(np.asarray(x1) - self.x_off + 1, 0, self.w)
        p = self.prefix
        c = p[yhi, xhi] - p[ylo, xhi] - p[yhi, xlo] + p[ylo, xlo]
        return np.where((yhi > ylo) & (xhi > xlo), c, 0)

    def box_count(self, gx, gy, rx, ry, wrap: bool = True):
        """Features within x-distance <= rx (wrapped when ``wrap``) and
        y-distance <= ry of each (gx, gy). Vectorized; lat always clips."""
        gx = np.asarray(gx)
        gy = np.asarray(gy)
        y0, y1 = gy - ry, gy + ry
        if not wrap:
            return self._window_count(y0, y1, gx - rx, gx + rx)
        n = self.n
        full_x = 2 * np.asarray(rx) + 1 >= n
        x0 = gx - rx
        x1 = gx + rx
        # wrapped box = up to two unwrapped column ranges
        a = self._window_count(y0, y1, np.maximum(x0, 0),
                               np.minimum(x1, n - 1))
        b = np.where(x0 < 0,
                     self._window_count(y0, y1, x0 + n,
                                        np.full_like(x0, n - 1)),
                     np.where(x1 > n - 1,
                              self._window_count(y0, y1, np.zeros_like(x1),
                                                 x1 - n),
                              0))
        whole = self._window_count(y0, y1, np.zeros_like(x0),
                                   np.full_like(x0, n - 1))
        return np.where(full_x, whole, a + b)


class _SparseCells:
    """Sorted (row-major) non-empty FINE-level feature cells for candidate
    enumeration: O(#non-empty-cells) memory regardless of level, so the
    cells strategy works at level 13-15 where dense urban skew actually
    lives (the round-2 dense grid capped level at 11 — ~20 km cells)."""

    def __init__(self, gx: np.ndarray, gy: np.ndarray, level: int,
                 counts: np.ndarray | None = None,
                 fbox: tuple | None = None):
        self.level = level
        self.n = 1 << level
        key = gy.astype(np.int64) * np.int64(self.n) + gx.astype(np.int64)
        order = np.argsort(key, kind="stable")
        self.keys = key[order]
        self.gx = gx[order].astype(np.int64)
        self.gy = gy[order].astype(np.int64)
        self.cnt = (counts[order].astype(np.int64) if counts is not None
                    else np.ones(self.keys.shape[0], np.int64))
        # optional per-cell FEATURE bbox (minx, maxx, miny, maxy arrays):
        # distance bounds over the actual feature spread instead of the
        # whole cell rectangle — tightens the candidate prune
        self.fbox = (tuple(np.asarray(a, np.float64)[order] for a in fbox)
                     if fbox is not None else None)

    def indices_in_ranges(self, x_ranges: list, y0: int, y1: int) -> np.ndarray:
        """Indices (into the sorted arrays) of fine cells with gy in
        [y0, y1] and gx in any inclusive [a, b] of ``x_ranges``. Two tiers:
        per-row binary search when the box has few rows, else one
        vectorized scan of the non-empty list (bounds the cost at
        O(#non-empty) per distinct query cell)."""
        m = self.keys.shape[0]
        if m == 0 or not x_ranges:
            return np.empty(0, dtype=np.int64)
        y0 = max(0, y0)
        y1 = min(self.n - 1, y1)
        if y1 < y0:
            return np.empty(0, dtype=np.int64)
        nrows = y1 - y0 + 1
        if nrows * 32 * len(x_ranges) < m:  # binary-search tier
            parts = []
            ys = np.arange(y0, y1 + 1, dtype=np.int64) * np.int64(self.n)
            for a, b in x_ranges:
                lo = np.searchsorted(self.keys, ys + a, side="left")
                hi = np.searchsorted(self.keys, ys + b + 1, side="left")
                lens = hi - lo
                tot = int(lens.sum())
                if tot:
                    # vectorized multi-range gather
                    starts = np.repeat(lo, lens)
                    offs = (np.arange(tot)
                            - np.repeat(np.cumsum(lens) - lens, lens))
                    parts.append(starts + offs)
            if not parts:
                return np.empty(0, dtype=np.int64)
            idx = np.concatenate(parts)
        else:  # scan tier
            ym = (self.gy >= y0) & (self.gy <= y1)
            xm = np.zeros(m, dtype=bool)
            for a, b in x_ranges:
                xm |= (self.gx >= a) & (self.gx <= b)
            idx = np.flatnonzero(ym & xm)
        return idx

    def cells_in_ranges(self, x_ranges: list, y0: int, y1: int) -> np.ndarray:
        idx = self.indices_in_ranges(x_ranges, y0, y1)
        return _cells.xy_to_cell(self.gx[idx], self.gy[idx], self.level)


def _x_ranges(gx: int, rx: int, n: int, wrap: bool) -> list:
    """The 0..2 inclusive [a, b] column ranges of a box of half-width rx
    around column gx (wrapped at the antimeridian iff ``wrap``)."""
    if 2 * rx + 1 >= n:
        return [(0, n - 1)]
    x0, x1 = gx - rx, gx + rx
    if not wrap:
        x0, x1 = max(0, x0), min(n - 1, x1)
        return [(x0, x1)] if x0 <= x1 else []
    if x0 < 0:
        return [(0, x1), (x0 + n, n - 1)]
    if x1 > n - 1:
        return [(x0, n - 1), (0, x1 - n)]
    return [(x0, x1)]


def _search_radii(hist: _CellHistogram, gx: np.ndarray, gy: np.ndarray,
                  k: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact per-query-cell search boxes (rx, ry) guaranteeing the true kNN
    set is inside under GREAT-CIRCLE distance, VECTORIZED over all distinct
    query cells at once:
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


def _search_radii_planar(hist: _CellHistogram, gx: np.ndarray,
                         gy: np.ndarray, k: int
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Exact search boxes under the PLANAR (squared lon/lat degrees)
    metric. Planar dlon does NOT wrap and the degree-space geometry is
    latitude-independent, so the radii come from pure Chebyshev arithmetic
    with no wrapping anywhere (round-2 reused the haversine radii here,
    which under-covered above ~52 deg latitude and wrapped a box the
    metric doesn't — ADVICE r2, medium)."""
    n = hist.n
    lon_ext = 360.0 / n
    lat_ext = 180.0 / n
    m = gx.shape[0]
    if hist.total <= k:
        full = np.full(m, n, dtype=np.int64)
        return full, full.copy()
    r = np.zeros(m, dtype=np.int64)
    idx = np.flatnonzero(hist.box_count(gx, gy, r, r, wrap=False) < k)
    while idx.size:
        r[idx] = np.minimum(n, np.where(r[idx] == 0, 1, r[idx] * 2))
        cnt = hist.box_count(gx[idx], gy[idx], r[idx], r[idx], wrap=False)
        idx = idx[(cnt < k) & (r[idx] < n)]
    # kth distance <= farthest corner of the (r+1)-cell box from any point
    # of the query cell
    d_up = np.hypot((r + 1) * lon_ext, (r + 1) * lat_ext)
    # a feature at column distance c has |dlon| >= (c-1)*lon_ext, so
    # rx = ceil(d_up/lon_ext) + 1 provably covers every feature within d_up
    rx = np.minimum(n, np.ceil(d_up / lon_ext).astype(np.int64) + 1)
    ry = np.minimum(n, np.ceil(d_up / lat_ext).astype(np.int64) + 1)
    return rx, ry


def _box_haversine_bounds(qx0, qx1, qy0, qy1, cx0, cx1, cy0, cy1):
    """(mind, maxd) great-circle meters between the query box
    [qx0,qx1]x[qy0,qy1] (scalars, degrees) and candidate boxes (arrays).
    EXACT interval arithmetic on the haversine identity
    sin^2(theta/2) = sin^2(dphi/2) + cos(phi1)cos(phi2) sin^2(dlambda/2):
    every factor is bounded monotonically over the boxes, so mind <= true
    distance <= maxd for EVERY point pair — no slack inequalities.
    Lon separations take the shorter way around the circle (<=180 deg)."""
    gap_u = np.maximum(0.0, np.maximum(cx0 - qx1, qx0 - cx1))
    gap_w = np.maximum(0.0, 360.0 - (np.maximum(cx1, qx1)
                                     - np.minimum(cx0, qx0)))
    dlon_min = np.minimum(gap_u, gap_w)
    # max over pairs of the shorter-way separation: <= 180 and <= the max
    # unwrapped separation (min(s, 360-s) peaks at 180)
    dlon_max = np.minimum(
        np.maximum(np.abs(cx1 - qx0), np.abs(qx1 - cx0)), 180.0)
    dlat_min = np.maximum(0.0, np.maximum(cy0 - qy1, qy0 - cy1))
    dlat_max = np.maximum(np.abs(cy1 - qy0), np.abs(qy1 - cy0))
    # cos(phi) extremes per band: max at the most equatorward latitude
    # (1 when the band crosses the equator), min at the most polar
    cos_q_max = np.where((np.asarray(qy0) <= 0.0) & (np.asarray(qy1) >= 0.0),
                         1.0,
                         np.cos(np.radians(np.minimum(np.abs(qy0),
                                                      np.abs(qy1)))))
    cos_q_min = np.cos(np.radians(np.maximum(np.abs(qy0), np.abs(qy1))))
    cos_c_max = np.where((cy0 <= 0.0) & (cy1 >= 0.0), 1.0,
                         np.cos(np.radians(np.minimum(np.abs(cy0),
                                                      np.abs(cy1)))))
    cos_c_min = np.cos(np.radians(np.maximum(np.abs(cy0), np.abs(cy1))))
    sin2 = lambda deg: np.sin(np.radians(deg) / 2.0) ** 2
    h_lo = sin2(dlat_min) + cos_q_min * cos_c_min * sin2(dlon_min)
    h_up = sin2(dlat_max) + cos_q_max * cos_c_max * sin2(dlon_max)
    two_r = 2.0 * EARTH_RADIUS_M
    mind = two_r * np.arcsin(np.sqrt(np.clip(h_lo, 0.0, 1.0)))
    maxd = two_r * np.arcsin(np.sqrt(np.clip(h_up, 0.0, 1.0)))
    return mind, maxd


# broadcasting-safe for (children x candidates) matrices too
_box_haversine_bounds_2d = _box_haversine_bounds


def _candidate_lists_for_coarse(hist, sparse, ux: np.ndarray, uy: np.ndarray,
                                qlevel: int, k: int, metric: str) -> list:
    """Candidate FINE-cell id arrays for each DISTINCT query cell
    (ux[j], uy[j]) at ``qlevel`` (>= hist.level; finer query cells give a
    smaller position-uncertainty margin and hence tighter pruning). The
    search box is derived at the coarse histogram level from the query
    cell's PARENT (a superset for every point of the child); the
    cell-level prune then runs against the qlevel cell box. Shared by the
    pandas-UDF route and the driver-side pair-table route; exactness
    lives here once."""
    s = sparse.level - hist.level
    shift = qlevel - hist.level
    wrap = metric == "haversine"
    pux, puy = ux >> shift, uy >> shift
    pkey = puy * np.int64(hist.n) + pux
    uniq_p, pinv = np.unique(pkey, return_inverse=True)
    upy = (uniq_p // hist.n).astype(np.int64)
    upx = (uniq_p % hist.n).astype(np.int64)
    if wrap:
        rx, ry = _search_radii(hist, upx, upy, k)
    else:
        rx, ry = _search_radii_planar(hist, upx, upy, k)
    # per unique PARENT: the box's candidate indices (cached across its
    # qlevel children)
    parent_idx = []
    for j in range(upx.shape[0]):
        xr = [((a << s), ((b + 1) << s) - 1)
              for a, b in _x_ranges(int(upx[j]), int(rx[j]), hist.n, wrap)]
        y0 = max(0, int(upy[j] - ry[j])) << s
        y1 = ((min(hist.n - 1, int(upy[j] + ry[j])) + 1) << s) - 1
        parent_idx.append(sparse.indices_in_ranges(xr, y0, y1))
    lon_ext_f = 360.0 / sparse.n
    lat_ext_f = 180.0 / sparse.n
    nq = 1 << qlevel
    lon_ext_q = 360.0 / nq
    lat_ext_q = 180.0 / nq
    # CELL-LEVEL PRUNE (exact-safe, both metrics), vectorized per PARENT
    # over (children x candidates) matrices: sort the covered fine cells
    # by a WORST-case distance bound from the query cell; D = the worst
    # case of the smallest prefix holding >= k features — the true kth
    # distance is <= D for every query point in this cell — then keep
    # only cells whose BEST-case distance bound can beat D. When the
    # index carries per-cell feature bboxes the bounds wrap the actual
    # feature spread, not the whole cell rectangle.
    lists = [None] * ux.shape[0]
    for j in range(upx.shape[0]):
        idx = parent_idx[j]
        child = np.flatnonzero(pinv == j)
        if idx.shape[0] == 0:
            empty = _cells.xy_to_cell(sparse.gx[idx], sparse.gy[idx],
                                      sparse.level)
            for i in child:
                lists[i] = (empty, np.inf)
            continue
        if sparse.fbox is not None:
            cx0 = sparse.fbox[0][idx][None, :]
            cx1 = sparse.fbox[1][idx][None, :]
            cy0 = sparse.fbox[2][idx][None, :]
            cy1 = sparse.fbox[3][idx][None, :]
        else:
            cx0 = (sparse.gx[idx] * lon_ext_f - 180.0)[None, :]
            cx1 = cx0 + lon_ext_f
            cy0 = (sparse.gy[idx] * lat_ext_f - 90.0)[None, :]
            cy1 = cy0 + lat_ext_f
        qx0 = (ux[child] * lon_ext_q - 180.0)[:, None]
        qx1 = qx0 + lon_ext_q
        qy0 = (uy[child] * lat_ext_q - 90.0)[:, None]
        qy1 = qy0 + lat_ext_q
        if not wrap:
            mind = np.hypot(
                np.maximum(0.0, np.maximum(cx0 - qx1, qx0 - cx1)),
                np.maximum(0.0, np.maximum(cy0 - qy1, qy0 - cy1)))
            maxd = np.hypot(np.maximum(cx1 - qx0, qx1 - cx0),
                            np.maximum(cy1 - qy0, qy1 - cy0))
        else:
            mind, maxd = _box_haversine_bounds_2d(qx0, qx1, qy0, qy1,
                                                  cx0, cx1, cy0, cy1)
        order = np.argsort(maxd, axis=1, kind="stable")
        csum = np.cumsum(np.take_along_axis(
            np.broadcast_to(sparse.cnt[idx], maxd.shape), order, axis=1),
            axis=1)
        # first position where the prefix holds >= k features (argmax on
        # the boolean mask; if none, the whole box stays, dmax = inf)
        hask = csum >= k
        pos = np.argmax(hask, axis=1)
        full_keep = ~hask[np.arange(hask.shape[0]), pos]
        dmax_row = np.where(full_keep, np.inf, np.take_along_axis(
            maxd, np.take_along_axis(order, pos[:, None], axis=1),
            axis=1).ravel())
        keep = mind <= dmax_row[:, None]
        cells_of_parent = _cells.xy_to_cell(sparse.gx[idx], sparse.gy[idx],
                                            sparse.level)
        for ci, i in enumerate(child):
            lists[i] = (cells_of_parent[keep[ci]], float(dmax_row[ci]))
    return lists


def _candidate_cells_udf(bc, k: int, metric: str, qlevel: int | None = None):
    """Per-query candidate cell list (array<long>): computed once per
    DISTINCT qlevel query cell per Arrow batch and fanned back to rows.
    ``bc`` is a Spark Broadcast of (hist, sparse) — deserialized once per
    executor, not pickled into each task closure. Fallback route when the
    driver-side pair table would be too large (see _ring_candidates)."""

    @pandas_udf(T.ArrayType(T.LongType()))
    def _cand(lon: pd.Series, lat: pd.Series) -> pd.Series:
        if len(lon) == 0:
            return pd.Series([], dtype=object)
        hist, sparse = bc.value
        ql = qlevel if qlevel is not None else hist.level + _QLEVEL_EXTRA
        nq = np.int64(1 << ql)
        gx, gy = _cells.grid_coords(lon.to_numpy(np.float64),
                                    lat.to_numpy(np.float64), ql)
        key = gy * nq + gx
        uniq, inverse = np.unique(key, return_inverse=True)
        uy = (uniq // nq).astype(np.int64)
        ux = (uniq % nq).astype(np.int64)
        lists = [a[0].tolist() for a in _candidate_lists_for_coarse(
            hist, sparse, ux, uy, ql, k, metric)]
        return pd.Series([lists[i] for i in inverse])

    return _cand


_HIST_MAX_LEVEL = 11   # coarse radius-oracle grid: <= ~33 MB cropped dense
_CELLS_MAX_LEVEL = 20  # fine join key: row-major key fits comfortably in i64


def _build_index(hist_rows, level: int):
    """(coarse dense histogram, fine sparse cell list) pair from collected
    (cell, count[, minx, maxx, miny, maxy]) rows — the local form consumed
    by the driver-side pair-table route; build_cell_index wraps it in a
    Spark broadcast. The optional per-cell feature bbox tightens the
    candidate prune (distance bounds over the actual feature spread)."""
    carr = np.array([r[0] for r in hist_rows], dtype=np.int64)
    cnts = np.array([r[1] for r in hist_rows], dtype=np.int64)
    fbox = (tuple(np.array([r[i] for r in hist_rows], dtype=np.float64)
                  for i in range(2, 6))
            if hist_rows and len(hist_rows[0]) >= 6 else None)
    fx, fy = (_cells.cell_xy(carr) if carr.shape[0]
              else (np.empty(0, np.int64), np.empty(0, np.int64)))
    hlevel = min(level, _HIST_MAX_LEVEL)
    sft = level - hlevel
    if carr.shape[0]:
        hx, hy = fx >> sft, fy >> sft
        hkey = hy * np.int64(1 << hlevel) + hx
        ukey, inv = np.unique(hkey, return_inverse=True)
        hcnt = np.bincount(inv, weights=cnts.astype(np.float64)).astype(np.int64)
        hist = _CellHistogram((ukey % (1 << hlevel)).astype(np.int64),
                              (ukey // (1 << hlevel)).astype(np.int64),
                              hcnt, hlevel)
    else:
        hist = _CellHistogram(np.empty(0, np.int64), np.empty(0, np.int64),
                              np.empty(0, np.int64), hlevel)
    sparse = _SparseCells(fx, fy, level, cnts, fbox=fbox)
    return hist, sparse


def build_cell_index(spark, hist_rows, level: int):
    """Build the (coarse dense histogram, fine sparse cell list) pair from
    collected (cell, count) rows and ship it as ONE Spark broadcast.
    Shared by the point kNN cells strategy and the nearest-line cells
    strategy (operators/lines.py).

    Measured broadcast size (pickled, BENCH/BASELINE.md): ~66 B per
    OCCUPIED cell, independent of level — 0.28 MB for 1M lattice features
    (2k cells), 62-66 MB worst-case for 1M uniformly scattered features at
    level 11-15. Memory is O(min(#features, 4^level)): beyond ~10M
    scattered features choose a coarser ``level`` (more candidates per
    cell, bounded index) — the coarse histogram is capped at
    _HIST_MAX_LEVEL regardless."""
    return spark.sparkContext.broadcast(_build_index(hist_rows, level))


_MAX_PAIR_ROWS = 1_000_000    # driver pair-table cap: the table ships as
                              # a LocalRelation inside task binaries
                              # (~24 B/row), so keep it tens of MB at most
_MAX_COARSE_ENUM = 262_144    # bbox-enumeration cap (cells; 512x512 box)
_QLEVEL_EXTRA = 3             # query-side grouping: hist.level + 3 (8x8
                              # children per coarse cell) tightens the
                              # position-uncertainty margin of the prune


def _ring_candidates(q: DataFrame, f: DataFrame, *, k: int, level: int,
                     max_rings: int, metric: str = "haversine") -> DataFrame:
    """Cells-strategy candidate pairs in exactly THREE (small) Spark jobs:

    job 1  feature cell histogram at the FINE level (groupBy(cell).count()
           → driver; one row per non-empty cell);
    job 2  query lon/lat EXTENT (1-row min/max aggregate — the coarse
           cells are enumerated from the bbox on the driver; a superset
           of the occupied cells is exact since pair rows for empty
           cells never match);
    job 3  queries fan out to candidate fine cells via a BROADCAST
           (coarse cell → fine cell) pair table computed once on the
           driver — pure JVM codegen, no Python on the query stream —
           then hash-join the feature side on the fine cell. The caller's
           window top-k runs in the same job.

    The pair-table route replaces the per-batch pandas UDF (r6: the UDF's
    ArrowEvalPython was the only Python stage of the strategy — guide
    §4.1); the per-coarse-cell enumeration is the SAME code either way
    (_candidate_lists_for_coarse), so candidate sets are identical. When
    the pair table would exceed _MAX_PAIR_ROWS (huge occupied extents at
    fine levels), the UDF route is used instead and job 2 is skipped.

    The radius search runs on a cropped dense histogram at
    min(level, 11); candidate enumeration runs on a SORTED SPARSE list of
    the fine cells, so ``level`` may go to 15+ (urban-skew resolution)
    without a 4^level grid.

    Exact for both metrics: haversine boxes are latitude-aware and wrap at
    the antimeridian; planar boxes are Chebyshev in degree space, unwrapped
    (see _search_radii / _search_radii_planar). ``max_rings`` is retained
    for signature compatibility but no longer bounds correctness.
    """
    if level > _CELLS_MAX_LEVEL:
        raise ValueError(f"cells strategy supports level <= {_CELLS_MAX_LEVEL}")
    spark = q.sparkSession
    fc = f.withColumn("_cell", _cell_of_jvm("_flon", "_flat", level))
    # The two index-building jobs are independent — overlap them from a
    # 2-thread pool so the second job back-fills executors freed by the
    # first's tail (guide §2.6). Query cells come by EXTENT, not by a
    # distinct scan: any SUPERSET of the occupied query cells is exact
    # (pair rows for empty cells never match), and a min/max aggregate is
    # one cheap partial-agg shuffle where a distinct through an upstream
    # round-robin repartition measured ~7x slower (its second exchange;
    # see OPTIMIZATION_r06.md).
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_rows = pool.submit(
            lambda: fc.groupBy("_cell").agg(
                F.count(F.lit(1)), F.min("_flon"), F.max("_flon"),
                F.min("_flat"), F.max("_flat")).collect())  # collect-ok: O(occupied cells) histogram (+feature bbox per cell) -> index
        f_ext = pool.submit(
            lambda: q.agg(F.min("_qlon"), F.max("_qlon"),
                          F.min("_qlat"), F.max("_qlat")).collect()[0])  # collect-ok: 1-row extent aggregate
        rows = f_rows.result()
        ext = f_ext.result()
    hist, sparse = _build_index(rows, level)
    qlevel = hist.level + _QLEVEL_EXTRA
    n_box = 0
    if ext[0] is not None:
        # walk qlevel down until the bbox enumeration fits the cap
        while True:
            gx0, gy0 = _cells.grid_coords(np.array([ext[0]]),
                                          np.array([ext[2]]), qlevel)
            gx1, gy1 = _cells.grid_coords(np.array([ext[1]]),
                                          np.array([ext[3]]), qlevel)
            n_box = int(gx1[0] - gx0[0] + 1) * int(gy1[0] - gy0[0] + 1)
            if n_box <= _MAX_COARSE_ENUM or qlevel <= hist.level:
                break
            qlevel -= 1
    if 0 < n_box <= _MAX_COARSE_ENUM:
        ux, uy = np.meshgrid(np.arange(gx0[0], gx1[0] + 1, dtype=np.int64),
                             np.arange(gy0[0], gy1[0] + 1, dtype=np.int64))
        ux, uy = ux.ravel(), uy.ravel()
        qcells = _cells.xy_to_cell(ux, uy, qlevel).tolist()
        lists = _candidate_lists_for_coarse(hist, sparse, ux, uy, qlevel,
                                            k, metric)
        n_pairs = int(sum(a.shape[0] for a, _ in lists))
    elif n_box == 0:
        qcells, lists, n_pairs = [], [], 0
    else:
        # huge query extent at a fine histogram level: fall back to the
        # per-row distinct inside the pandas UDF route
        qcells, lists, n_pairs = [], [], _MAX_PAIR_ROWS + 1
    if n_pairs <= _MAX_PAIR_ROWS:
        # each pair row also carries D = the per-query-cell kth-distance
        # UPPER bound from the prune: knn_join filters dist <= D in
        # codegen BEFORE the top-k window, so non-winners never enter the
        # sort/exchange (exact: every true top-k distance is <= D).
        # Built as numpy arrays → pandas → Arrow: ~2x faster to ship than
        # a list of Python tuples (row-pickle path).
        counts = np.array([a.shape[0] for a, _ in lists], dtype=np.int64)
        pdf = pd.DataFrame({
            "_qcell": np.repeat(np.asarray(qcells, np.int64), counts),
            "_cell": (np.concatenate([a for a, _ in lists])
                      if counts.sum() else np.empty(0, np.int64)),
            "_dmax": np.repeat(np.array([d for _, d in lists], np.float64),
                               counts),
        })
        pairs_df = spark.createDataFrame(pdf, "_qcell long, _cell long, _dmax double")
        qcell_expr = _cell_of_jvm("_qlon", "_qlat", qlevel)
        qc = (q.withColumn("_qcell", qcell_expr)
              .join(F.broadcast(pairs_df), "_qcell", "inner")
              .drop("_qcell"))
    else:
        bc = spark.sparkContext.broadcast((hist, sparse))
        cand_cells = _candidate_cells_udf(bc, k, metric, qlevel=qlevel)
        qc = (q.withColumn("_cell", F.explode(cand_cells(F.col("_qlon"),
                                                         F.col("_qlat")))))
    return qc.join(fc, "_cell", "inner").drop("_cell")


def _cell_of_jvm(lon, lat, level: int):
    from spandex_spark.functions.cells_sql import cell_of_expr
    return cell_of_expr(lon, lat, level)


from pyspark.sql import types as T  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402
import pandas as pd  # noqa: E402
