"""The r6 driver-side (coarse cell → candidate fine cells) pair-table
route of the kNN cells strategy must produce exactly the rows of the
pandas-UDF route it replaced (same _candidate_lists_for_coarse, so the
candidate sets are identical by construction — this guards the plumbing:
coarse-cell expr parity, join fan-out, empty-list drops)."""

import importlib

from pyspark.sql import functions as F

from spandex_spark.operators import knn_join
from spandex_spark.sources.grids import derived_points, gazetteer_grid_df

knnmod = importlib.import_module("spandex_spark.operators.knn")


def _rows(spark, metric, k=3, level=7):
    pts = derived_points(
        spark.range(500).select(F.col("id").alias("pt_id")), "pt_id")
    out = knn_join(pts, gazetteer_grid_df(spark), k=k,
                   query_id_col="pt_id", feature_id_col="poi_k",
                   strategy="cells", level=level, metric=metric)
    return sorted((r["pt_id"], r["rank"], r["poi_k"], round(r["dist_m"], 9))
                  for r in out.collect())


class TestPairTableRoute:
    def test_matches_udf_fallback_both_metrics(self, spark):
        for metric in ("planar", "haversine"):
            fast = _rows(spark, metric)
            orig = knnmod._MAX_PAIR_ROWS
            knnmod._MAX_PAIR_ROWS = -1  # force the UDF fallback
            try:
                slow = _rows(spark, metric)
            finally:
                knnmod._MAX_PAIR_ROWS = orig
            assert fast == slow and len(fast) == 1500

    def test_haversine_prune_vs_bruteforce(self, spark):
        # the r6 great-circle cell prune must never drop a true winner:
        # compare against the broadcast (exact cross-join) strategy on a
        # nasty layout — high latitudes, antimeridian-spanning features
        import numpy as np
        rng = np.random.default_rng(7)
        fl = [(int(i), float(lon), float(lat)) for i, (lon, lat) in
              enumerate(zip(rng.uniform(-180, 180, 60),
                            rng.uniform(-89, 89, 60)))]
        fl += [(100, 179.5, 70.0), (101, -179.5, 70.2), (102, 0.0, 88.5),
               (103, 179.9, -88.0), (104, -179.9, -88.1)]
        feats = spark.createDataFrame(fl, "fid long, lon double, lat double")
        ql = [(int(1000 + i), float(lon), float(lat)) for i, (lon, lat) in
              enumerate(zip(rng.uniform(-180, 180, 200),
                            rng.uniform(-89, 89, 200)))]
        ql += [(2000, 179.8, 69.9), (2001, -179.7, 71.0), (2002, 1.0, 89.0),
               (2003, -179.95, -88.05)]
        qs = spark.createDataFrame(ql, "qid long, lon double, lat double")
        from spandex_spark.operators import knn_join
        for level in (5, 8):
            a = knn_join(qs, feats, k=4, query_id_col="qid",
                         feature_id_col="fid", strategy="cells",
                         level=level, metric="haversine")
            b = knn_join(qs, feats, k=4, query_id_col="qid",
                         feature_id_col="fid", strategy="broadcast",
                         metric="haversine")
            ra = sorted((r["qid"], r["rank"], r["fid"]) for r in a.collect())
            rb = sorted((r["qid"], r["rank"], r["fid"]) for r in b.collect())
            assert ra == rb, f"level {level}"

    def test_matches_broadcast_strategy(self, spark):
        pts = derived_points(
            spark.range(300).select(F.col("id").alias("pt_id")), "pt_id")
        gaz = gazetteer_grid_df(spark)
        a = knn_join(pts, gaz, k=2, query_id_col="pt_id",
                     feature_id_col="poi_k", strategy="cells", level=9,
                     metric="planar")
        b = knn_join(pts, gaz, k=2, query_id_col="pt_id",
                     feature_id_col="poi_k", strategy="broadcast",
                     metric="planar")
        ra = sorted((r["pt_id"], r["rank"], r["poi_k"]) for r in a.collect())
        rb = sorted((r["pt_id"], r["rank"], r["poi_k"]) for r in b.collect())
        assert ra == rb
