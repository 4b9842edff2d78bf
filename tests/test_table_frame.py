"""O12 TableFrame: column-pruned cached projections + column mirror."""

import os

from pyspark.sql import functions as F

from spandex_spark.sources.table_frame import TableFrame


def test_column_pruning_and_cache(spark, fixture_dir):
    tf = TableFrame(spark, os.path.join(fixture_dir, "poi.parquet"),
                    index_col="poi_id")
    proj = tf["lon", "lat"]
    # pruned scan: only requested columns + index in the read schema
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "category" not in plan.split("ReadSchema")[-1][:200]
    assert proj.columns == ["poi_id", "lat", "lon"]
    # cached: same object returned
    assert tf["lat", "lon"] is proj
    tf.unpersist()


def test_update_col_mirrors_and_invalidates(spark, fixture_dir):
    tf = TableFrame(spark, os.path.join(fixture_dir, "poi.parquet"),
                    index_col="poi_id")
    first = tf["category"]
    doubled = tf.df().select("poi_id", (F.col("lon") * 2).alias("lon2"))
    tf.update_col("lon2", doubled)
    assert "lon2" in tf.columns
    got = {r.poi_id: r.lon2 for r in tf["lon2", "lon"].collect()}
    base = {r.poi_id: r.lon for r in tf["lon"].collect()}
    assert all(abs(got[k] - 2 * base[k]) < 1e-12 for k in base)
    assert tf["category"] is first  # untouched projection stays cached
    tf.unpersist()
