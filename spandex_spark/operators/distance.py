"""Within-distance (range) join — the ST_DWithin analog.

Reference semantics: PostGIS `ST_DWithin(a, b, r)` joins, the workhorse
behind every "features near X" query the reference's SQL templates can
express (spandex/spatialtoolz.py delegates distance predicates to
PostGIS). Emits ALL (point, feature) pairs within ``radius``, not just
the k nearest — the complement of operators/knn.py.

Spark realization — pure JVM, zero Python, one shuffle:

* both sides key on a ROW-MAJOR grid cell (gy·2^L + gx) at a level whose
  cell spans at least the radius box, so a point's candidates live in its
  own cell and the ring around it;
* the point side explodes its radius box into
  ``sequence(gx0..gx1) × sequence(gy0..gy1)`` candidate cells — plain
  Column arithmetic, ≤ 3×3 cells at mid latitudes and per-row adaptive
  where the haversine lon-radius widens toward the poles;
* longitude wraps through ±180 via pmod (antimeridian-safe); latitude
  clamps at the poles;
* one equi-join on the cell key + the exact distance predicate
  (JVM haversine or planar arithmetic) finishes the job.

Scale shape: the only shuffle is the cell-key equi-join (skip it entirely
with ``broadcast_features=True`` for small layers); candidate fan-out is
bounded by the box size, and a hot cell is an operators/skew.py salting
candidate, not an algorithmic failure.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spandex_spark.geom import EARTH_RADIUS_M
from spandex_spark.operators.knn import haversine_expr

_DEG_M = EARTH_RADIUS_M * math.pi / 180.0   # meters per degree of latitude


def _grid_floor(coord, origin: float, extent: float, n: int):
    """Raw (unclamped) row index of ``coord`` on the n-cell grid — same
    float ops as cells.grid_coords minus the clip, so wrap handling can
    pmod instead of saturate."""
    return F.floor((coord - F.lit(origin)) / F.lit(extent) * F.lit(float(n))) \
            .cast("long")


def grid_key_of(lon: float, lat: float, level: int) -> int:
    """The join key within_distance_join buckets a feature at — PASS THESE
    to ``salt_hot``. This is the operator's own row-major grid key
    (gy * 2^level + gx over the clamped lon/lat grid), NOT cells.cell_of's
    interleaved quadkey; a quadkey in ``salt_hot`` silently matches no row
    and the salting is a no-op."""
    n = 1 << level
    gx = min(n - 1, max(0, int(math.floor((lon + 180.0) / 360.0 * n))))
    gy = min(n - 1, max(0, int(math.floor((lat + 90.0) / 180.0 * n))))
    return gy * n + gx


def level_for_radius(dlat_deg: float, max_level: int = 20) -> int:
    """Finest level whose cell still spans the latitude radius, so the
    radius box never needs more than one ring of neighbours per axis at
    the equator (180/2^L >= dlat ⇒ ≤ 3 rows of cells)."""
    lvl = int(math.floor(math.log2(180.0 / max(dlat_deg, 1e-12))))
    return max(0, min(max_level, lvl))


def within_distance_join(points: DataFrame, features: DataFrame, *,
                         radius: float, point_id_col: str,
                         feature_id_col: str,
                         p_lon: str = "lon", p_lat: str = "lat",
                         f_lon: str = "lon", f_lat: str = "lat",
                         metric: str = "haversine", level: int | None = None,
                         broadcast_features: bool = False,
                         salt_hot: list[int] | None = None,
                         salt_fanout: int = 8) -> DataFrame:
    """All (point, feature) pairs with distance <= ``radius``.

    ``metric``: 'haversine' (radius in METERS, great-circle) or 'planar'
    (radius in DEGREES, exact FP-reproducible arithmetic for SQL-oracle
    parity). Returns (point_id_col, feature_id_col, dist) where dist is
    meters or degrees to match the metric.

    ``salt_hot``: explicit mega-cell mitigation (E3, operators/skew.py) —
    the listed cell keys join on (cell, salt) with the feature side fanned
    out ``salt_fanout``×, splitting a dense-city cell's shuffle partition.
    Keys MUST come from ``grid_key_of(lon, lat, level)`` (this operator's
    row-major grid key — not cells.cell_of's quadkey, which silently
    matches nothing). Result-identical; only relevant when the feature
    side actually SHUFFLES (too big for Catalyst's auto-broadcast) AND
    AQE skew-join can't split the partition — pointless under
    ``broadcast_features``.
    """
    if metric not in ("haversine", "planar"):
        raise ValueError(f"unknown metric {metric!r}")
    if radius <= 0:
        raise ValueError("radius must be positive")
    if metric == "haversine":
        dlat = radius / _DEG_M
        # conservative per-row lon radius at the box's extreme latitude
        lat_edge = F.least(F.lit(89.9), F.abs(F.col("_plat")) + F.lit(dlat))
        dlon = F.lit(dlat) / F.cos(F.radians(lat_edge))
    else:
        dlat = radius
        dlon = F.lit(radius)
    if level is None:
        level = level_for_radius(dlat)
    n = 1 << level

    p = points.select(F.col(point_id_col).alias("_pid"),
                      F.col(p_lon).alias("_plon"),
                      F.col(p_lat).alias("_plat"))
    f = features.select(F.col(feature_id_col).alias("_fid"),
                        F.col(f_lon).alias("_flon"),
                        F.col(f_lat).alias("_flat"))

    gx0 = _grid_floor(F.col("_plon") - dlon, -180.0, 360.0, n)
    gx1 = _grid_floor(F.col("_plon") + dlon, -180.0, 360.0, n)
    gy0 = F.greatest(F.lit(0).cast("long"),
                     _grid_floor(F.col("_plat") - F.lit(dlat), -90.0, 180.0, n))
    gy1 = F.least(F.lit(n - 1).cast("long"),
                  _grid_floor(F.col("_plat") + F.lit(dlat), -90.0, 180.0, n))
    # lon candidates wrap via pmod; a box wider than the world degrades to
    # every column once (sequence clamped to n cells)
    gx1 = F.least(gx1, gx0 + F.lit(n - 1))
    pc = (p.withColumn("_gx", F.explode(F.sequence(gx0, gx1)))
          .withColumn("_gy", F.explode(F.sequence(gy0, gy1)))
          .withColumn("_ck", F.col("_gy") * F.lit(n) + F.pmod(F.col("_gx"),
                                                              F.lit(n)))
          .drop("_gx", "_gy"))

    fgx = F.greatest(F.lit(0).cast("long"),
                     F.least(F.lit(n - 1).cast("long"),
                             _grid_floor(F.col("_flon"), -180.0, 360.0, n)))
    fgy = F.greatest(F.lit(0).cast("long"),
                     F.least(F.lit(n - 1).cast("long"),
                             _grid_floor(F.col("_flat"), -90.0, 180.0, n)))
    fc = f.withColumn("_ck", fgy * F.lit(n) + fgx)
    if broadcast_features:
        fc = F.broadcast(fc)

    if salt_hot:
        from spandex_spark.operators.skew import salted_cell_join
        cand = salted_cell_join(
            pc.withColumnRenamed("_ck", "cell"),
            fc.withColumnRenamed("_ck", "cell"),
            hot=salt_hot, fanout=salt_fanout,
            point_salt_col="_pid").drop("cell")
    else:
        cand = pc.join(fc, "_ck").drop("_ck")
    if metric == "haversine":
        dist = haversine_expr(F.col("_plon"), F.col("_plat"),
                              F.col("_flon"), F.col("_flat"))
    else:
        dx = F.col("_plon") - F.col("_flon")
        dy = F.col("_plat") - F.col("_flat")
        dist = F.sqrt(dx * dx + dy * dy)
    out = (cand.withColumn("_d", dist)
           .filter(F.col("_d") <= F.lit(float(radius)))
           # a wide box can hand the same pair to several candidate cells
           # only when the box clamps/wraps onto itself; the key equality
           # makes duplicates impossible otherwise because a feature owns
           # exactly ONE cell — dedup is therefore a no-op shuffle-free
           # filter on distinct keys, not a dropDuplicates
           )
    return out.select(F.col("_pid").alias(point_id_col),
                      F.col("_fid").alias(feature_id_col),
                      F.col("_d").alias("dist"))
