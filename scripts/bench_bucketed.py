"""Measure the bucketed co-located tag join against the two ad-hoc paths.

The honest comparison for the 100 TB story is bucketed vs SHUFFLE (both
sides too big to broadcast — auto-broadcast is disabled for those runs):
the bucketed layout pays the cell shuffle once at write time, then every
query joins exchange-free. The broadcast path is also timed for context
(it stays the right plan whenever the polygon layer fits an executor).

Usage: python scripts/bench_bucketed.py [n_points] (default 5_000_000)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_points: int, level: int = 9) -> None:
    from pyspark.sql import functions as F

    from spandex_spark.bucketing import (tag_points_bucketed,
                                         write_points_bucketed,
                                         write_polygons_bucketed)
    from spandex_spark.operators.tag import tag_points
    from spandex_spark.session import get_spark
    from spandex_spark.sources.grids import derived_points, zones_df

    spark = get_spark("bench_bucketed")
    base = tempfile.mkdtemp()
    pts = derived_points(
        spark.range(n_points).select(F.col("id").alias("pt_id")), "pt_id") \
        .repartition(32)

    t0 = time.time()
    write_points_bucketed(pts, "bb_pts", level=level, n_buckets=32,
                          path=os.path.join(base, "pts"))
    write_polygons_bucketed(zones_df(spark), "bb_zones",
                            poly_id_col="zone_id", level=level, n_buckets=32,
                            path=os.path.join(base, "zones"))
    t_layout = time.time() - t0

    # plain parquet copy of the same points for the ad-hoc paths (same IO)
    spark.table("bb_pts").drop("cell").write.mode("overwrite") \
        .parquet(os.path.join(base, "pts_plain"))
    plain = spark.read.parquet(os.path.join(base, "pts_plain"))
    zones = zones_df(spark)

    def timed(df):
        t = time.time()
        n = df.count()
        return n, time.time() - t

    results = {}

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    n, s = timed(tag_points_bucketed(
        spark, "bb_pts", "bb_zones", poly_id_col="zone_id",
        point_id_col="pt_id", assume_disjoint=True))
    results["bucketed"] = (n, s)
    n, s = timed(tag_points(
        plain, zones, poly_id_col="zone_id", point_id_col="pt_id",
        level=level, broadcast_polys=False, assume_disjoint=True))
    results["shuffle"] = (n, s)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                   str(64 * 1024 * 1024))
    n, s = timed(tag_points(
        plain, zones, poly_id_col="zone_id", point_id_col="pt_id",
        level=level, assume_disjoint=True))
    results["broadcast"] = (n, s)

    print(f"n_points={n_points} level={level} layout_write_s={t_layout:.2f}")
    for k, (n, s) in results.items():
        print(f"{k:10s} rows={n} sec={s:.3f} rows_per_s={n / s:,.0f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 9)
