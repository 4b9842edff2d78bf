"""Throughput measurements for the round-5 fourth-to-seventh batch
operators at sf0.1 scale on local[32] (bench-hygiene protocol:
serialized jobs, one measurement session, report per-op wall +
derived throughput; run N times and keep the best window).

Run: python scripts/bench_new_ops.py [--mult 64]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(sys.argv[sys.argv.index("--mult") + 1]) \
    if "--mult" in sys.argv else 64


def main():
    from pyspark.sql import functions as F

    from spandex_spark.session import get_spark
    from spandex_spark.sources.grids import derived_points, roads_df

    spark = get_spark("bench_new_ops", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    cust = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey")
    pts = derived_points(cust, "c_custkey")
    big = (pts.withColumn("rep", F.explode(F.sequence(
        F.lit(0), F.lit(MULT - 1))))
        .select((F.col("c_custkey") * MULT + F.col("rep"))
                .alias("pt_id"), "lon", "lat",
                (F.col("rep") % 13).cast("double").alias("v"))
        .persist())
    n_big = big.count()
    n_small = pts.count()
    docs = spark.read.parquet(f"{SF}/documents.parquet").persist()
    n_docs = docs.count()

    out = {}

    def t(name, fn, unit_rows):
        t0 = time.time()
        res = fn()
        dt = time.time() - t0
        out[name] = {"sec": round(dt, 3), "rows": unit_rows,
                     "rows_per_sec": round(unit_rows / dt)}
        print(name, out[name], flush=True)
        return res

    from spandex_spark.operators import (bm25_rank, entropy_stats,
                                         getis_ord_gi_star, hexbin,
                                         idw_grid, kernel_density_grid,
                                         lm_perplexity, map_match,
                                         morans_i, tile_pyramid,
                                         train_char_lm)

    t("tile_pyramid z2-z12", lambda: tile_pyramid(
        big, min_zoom=2, max_zoom=12, weight_col="v")
      .agg(F.sum("n")).collect(), n_big)
    t("hexbin size=0.05deg", lambda: hexbin(big, size=0.05)
      .agg(F.sum("n")).collect(), n_big)
    t("morans_i r=0.1 (600k pts)", lambda: morans_i(
        big.limit(600000), radius=0.1, value_col="v",
        id_col="pt_id").collect(), 600000)
    t("gi_star r=0.1 (600k pts)", lambda: getis_ord_gi_star(
        big.limit(600000), radius=0.1, value_col="v",
        id_col="pt_id").count(), 600000)
    t("idw_grid 200x200 r=0.5", lambda: idw_grid(
        pts.withColumn("v", (F.col("c_custkey") % 7).cast("double")),
        value_col="v", origin_x=-10.0, origin_y=-10.0, step=0.1,
        nx=200, ny=200, radius=0.5).count(), n_small)
    t("kde_grid 200x200 h=0.5", lambda: kernel_density_grid(
        pts, origin_x=-10.0, origin_y=-10.0, step=0.1,
        nx=200, ny=200, bandwidth=0.5).count(), n_small)
    model = train_char_lm(docs, text_col="text", sample_rows=500)
    t("lm_perplexity (docs)", lambda: lm_perplexity(
        docs, model, text_col="text").agg(
        F.avg("perplexity")).collect(), n_docs)
    t("bm25 (docs)", lambda: bm25_rank(
        docs, ["data", "quality", "zone", "model"]).count(), n_docs)
    t("entropy_stats (docs)", lambda: entropy_stats(
        docs).count(), n_docs)
    trk = (big.limit(200000)
           .select((F.col("pt_id") % 2000).alias("trip"),
                   F.timestamp_seconds(F.lit(1767225600)
                                       + F.col("pt_id")).alias("ts"),
                   "lon", "lat"))
    t("map_match (200k pts, 2k tracks)", lambda: map_match(
        trk, roads_df(spark), group_col="trip",
        road_id_col="road_id").count(), 200000)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
