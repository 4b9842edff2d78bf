"""spark-submit entry script (north rule: `spark-submit --py-files` on a
multi-executor cluster).

Usage (cluster):
    ./scripts/make_pyfiles.sh          # builds dist/sx.zip from CURRENT source
    spark-submit --py-files dist/sx.zip scripts/submit_job.py \
        --sf-dir /data/pages --out /data/out --run-id prod-001 --buckets 512

(dist/ is gitignored — always rebuild the zip so it can't go stale
relative to spandex_spark/.)

Runs the flagship pipeline (geotag -> PIP tag -> kNN) with partition-
granularity checkpoint/resume and lineage metrics (E5/E6). Re-running the
same --run-id + --out resumes: only missing buckets are processed.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--buckets", type=int, default=128)
    ap.add_argument("--level", type=int, default=9)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F
    from spandex_spark.checkpoint import CheckpointedStage
    from spandex_spark.operators import tag_points, knn_join
    from spandex_spark.sources.grids import (
        derived_points, zones_df, gazetteer_grid_df)

    spark = SparkSession.builder.appName("spandex_spark_job").getOrCreate()
    li = spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))
    pts = derived_points(
        li.select((F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("pt_id")),
        "pt_id")
    zones = zones_df(spark)
    gaz = gazetteer_grid_df(spark)

    stage = CheckpointedStage(args.out, run_id=args.run_id,
                              stage="tag_knn", n_buckets=args.buckets)

    def fn(bucket_df):
        tagged = tag_points(bucket_df, zones, poly_id_col="zone_id",
                            point_id_col="pt_id", level=args.level)
        nn = knn_join(bucket_df, gaz, k=1, query_id_col="pt_id",
                      feature_id_col="poi_k")
        return tagged.join(nn.select("pt_id", "poi_k"), "pt_id")

    out = stage.run(spark, pts, F.col("pt_id"), fn)
    print("rows:", out.count())
    print("metrics rows:", stage.read_metrics(spark).count())
    spark.stop()


if __name__ == "__main__":
    main()
