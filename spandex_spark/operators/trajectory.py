"""Trajectory operators — ST_MakeLine, trip statistics, stay points.

Reference semantics: the movement-data toolbox layered on PostGIS in
every urban-mobility stack (the reference's UrbanSim domain):
`ST_MakeLine(point ORDER BY ts)` per entity builds tracks;
trip statistics (length/duration/speed) are its standard rollup; and
stay-point detection is the canonical Li et al. 2008 ("Mining user
similarity based on location history", GIS '08) dwell extractor —
the step that turns geotagged event streams (here: per-user geotagged
web-page visits, the graft's axis) into visited places.

Spark realization:

* `make_line` is PURE CODEGEN: one groupBy with
  array_sort(collect_list(struct(ts, lon, lat))) → transform() into
  the engine's SoA linestring (geom.py kind=2, parts OPEN, bbox from
  array_min/max).  Ties on ts break by (lon, lat) — array_sort's
  struct ordering — so the line is deterministic under any
  partitioning.  Contract: ONE GROUP'S TRACK FITS ONE ROW (the
  dissolve_by/union_by executor-sized-group contract); trillion-point
  fleets have bounded per-vehicle tracks, that's the 100 TB shape.
* `trip_stats` never materializes geometry: lag-window step distances
  (JVM haversine) reduce in the same shuffle as the window (groupBy
  reuses the window's hash partitioning — one Exchange total).
* `stay_points` runs the Li scan per group in applyInPandas (the
  algorithm is inherently sequential per track; tracks are the
  bounded unit of work).  Anchor i extends to the first j with
  dist(p_i, p_j) > radius; if the dwell t_{j-1} - t_i >= min_duration
  the window's centroid is a stay point.  Deterministic; timestamps
  sort with (lon, lat) tiebreak exactly like make_line.

All distances are great-circle meters (operators/knn.py haversine).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spandex_spark.geom import EARTH_RADIUS_M

__all__ = ["make_line", "trip_stats", "stay_points", "od_matrix"]


def make_line(df: DataFrame, *, group_col: str, ts_col: str = "ts",
              lon_col: str = "lon", lat_col: str = "lat",
              geom_col: str = "geom") -> DataFrame:
    """One kind=2 SoA linestring per group, vertices in (ts, lon, lat)
    order.  Output: (group_col, n_points, geom_col).  Groups with a
    single point still emit a (degenerate) one-vertex line — callers
    filter on n_points if they need real segments."""
    pts = F.array_sort(F.collect_list(
        F.struct(F.col(ts_col).alias("ts"),
                 F.col(lon_col).alias("lon"),
                 F.col(lat_col).alias("lat"))))
    g = (df.groupBy(group_col)
         .agg(pts.alias("_pts")))
    xs = F.transform("_pts", lambda p: p["lon"])
    ys = F.transform("_pts", lambda p: p["lat"])
    geom = F.struct(
        F.lit(2).cast("tinyint").alias("kind"),
        xs.alias("xs"), ys.alias("ys"),
        F.array(F.lit(0), F.size("_pts")).alias("ring_offsets"),
        F.struct(F.array_min(xs).alias("minx"),
                 F.array_min(ys).alias("miny"),
                 F.array_max(xs).alias("maxx"),
                 F.array_max(ys).alias("maxy")).alias("bbox"))
    return g.select(group_col, F.size("_pts").alias("n_points"),
                    geom.alias(geom_col))


def _haversine_m(lon1, lat1, lon2, lat2):
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (F.sin(dlat / 2) * F.sin(dlat / 2)
         + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
         * F.sin(dlon / 2) * F.sin(dlon / 2))
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def trip_stats(df: DataFrame, *, group_col: str, ts_col: str = "ts",
               lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Per-group track rollup: n_points, start_ts, end_ts, duration_s,
    length_m (great-circle vertex-to-vertex), avg_speed_ms (NULL for
    zero duration), max_gap_s (largest time step).  One Exchange: the
    lag window and the groupBy share the partitioning key."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(ts_col), F.col(lon_col), F.col(lat_col))
    plon, plat = F.lag(lon_col).over(w), F.lag(lat_col).over(w)
    pts_ = F.lag(ts_col).over(w)
    step = df.select(
        group_col, ts_col, lon_col, lat_col,
        F.when(plon.isNotNull(),
               _haversine_m(plon, plat, F.col(lon_col),
                            F.col(lat_col))).alias("_step_m"),
        F.when(pts_.isNotNull(),
               F.unix_micros(F.col(ts_col).cast("timestamp"))
               - F.unix_micros(pts_.cast("timestamp")))
        .alias("_gap_us"))   # cast: unix_micros rejects TIMESTAMP_NTZ
    out = (step.groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("n_points"),
                F.min(ts_col).alias("start_ts"),
                F.max(ts_col).alias("end_ts"),
                F.sum("_step_m").alias("_len"),
                F.max("_gap_us").alias("_maxgap")))
    dur = (F.unix_micros(F.col("end_ts").cast("timestamp"))
           - F.unix_micros(F.col("start_ts").cast("timestamp"))) / 1e6
    return out.select(
        group_col, "n_points", "start_ts", "end_ts",
        dur.alias("duration_s"),
        F.coalesce(F.col("_len"), F.lit(0.0)).alias("length_m"),
        F.when(dur > 0, F.coalesce(F.col("_len"), F.lit(0.0)) / dur)
        .alias("avg_speed_ms"),
        (F.col("_maxgap") / 1e6).alias("max_gap_s"))


def stay_points(df: DataFrame, *, group_col: str, radius_m: float,
                min_duration_s: float, ts_col: str = "ts",
                lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Li et al. 2008 stay points per group: maximal windows whose
    FIRST point anchors every member within `radius_m`, dwelling at
    least `min_duration_s`.  Output: (group_col, stay_id [0..k per
    group, time order], lon, lat [arithmetic centroid], arrive_ts,
    depart_ts, n_points)."""
    from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                                   StructType, TimestampType)
    gf = df.schema[group_col]
    schema = StructType([
        StructField(group_col, gf.dataType),
        StructField("stay_id", IntegerType()),
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
        StructField("arrive_ts", TimestampType()),
        StructField("depart_ts", TimestampType()),
        StructField("n_points", IntegerType()),
    ])
    R = EARTH_RADIUS_M

    def scan(key, pdf: pd.DataFrame):
        pdf = pdf.sort_values([ts_col, lon_col, lat_col],
                              kind="mergesort")
        lon = pdf[lon_col].to_numpy(float)
        lat = pdf[lat_col].to_numpy(float)
        ts = pdf[ts_col].to_numpy()
        n = lon.shape[0]
        rows, i, sid = [], 0, 0
        while i < n:
            # great-circle distance from anchor i to every later point
            la1, la2 = math.radians(lat[i]), np.radians(lat[i + 1:])
            dlo = np.radians(lon[i + 1:] - lon[i])
            dla = la2 - la1
            a = (np.sin(dla / 2) ** 2
                 + math.cos(la1) * np.cos(la2) * np.sin(dlo / 2) ** 2)
            d = 2 * R * np.arcsin(np.sqrt(a))
            far = np.nonzero(d > radius_m)[0]
            j = (i + 1 + far[0]) if far.size else n
            dwell = (ts[j - 1] - ts[i]) / np.timedelta64(1, "s")
            if dwell >= min_duration_s:
                rows.append((key[0], sid,
                             float(lon[i:j].mean()),
                             float(lat[i:j].mean()),
                             pd.Timestamp(ts[i]), pd.Timestamp(ts[j - 1]),
                             int(j - i)))
                sid += 1
                i = j
            else:
                i += 1
        return pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return (df.select(group_col, ts_col, lon_col, lat_col)
            .groupBy(group_col).applyInPandas(scan, schema=schema))


def od_matrix(df: DataFrame, *, group_col: str, loc_col: str,
              ts_col: str = "ts", include_self: bool = False) -> DataFrame:
    """Origin-destination flow matrix — the urban-mobility rollup of a
    zone-tagged event stream (tag the stream with operators/tag.py
    first; UrbanSim's travel-model input shape): count consecutive
    per-entity transitions loc[i] -> loc[i+1] in time order.

    Output: (origin, destination, n) over all groups; NULL locations
    (points outside every zone) break the chain — neither side of a
    transition may be NULL.  `include_self` keeps loc -> same-loc
    steps (dwell ticks), off by default.  One window + one groupBy,
    pure JVM; ties on ts order by (lon-free) location value so the
    result is partitioning-deterministic."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(ts_col), F.col(loc_col))
    prev = F.lag(loc_col).over(w)
    steps = (df.select(F.col(group_col), F.col(ts_col),
                       F.col(loc_col).alias("destination"),
                       prev.alias("origin"))
             .filter(F.col("origin").isNotNull()
                     & F.col("destination").isNotNull()))
    if not include_self:
        steps = steps.filter(F.col("origin") != F.col("destination"))
    return (steps.groupBy("origin", "destination")
            .agg(F.count(F.lit(1)).alias("n")))
