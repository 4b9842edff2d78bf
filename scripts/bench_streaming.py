"""Streaming throughput evidence: stream_zone_rates (geotag → PIP tag →
watermarked windowed per-zone counts) driven availableNow over a synthetic
page directory; reports pages/sec through the full spatial pipeline.

Pages are generated JVM-side (no Python in the generator): every page
carries an explicit ``geo:lat,lon`` token (the geotag fast path — the
gazetteer path is exercised by the batch bench/tests), timestamps spread
over 48 one-hour windows so the windowed state is realistic, ~64 parquet
files so maxFilesPerTrigger yields multiple micro-batches.

Usage: python scripts/bench_streaming.py [n_pages] (default 2,000,000)
Prints one JSON line; appends nothing — copy numbers into
BENCH/BASELINE.md manually.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import functions as F
    from spandex_spark.session import get_spark
    from spandex_spark.sources.grids import zones_df

    spark = get_spark("bench_streaming", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS) * 2, 16))
    root = tempfile.mkdtemp(prefix="stream_bench_")
    src = os.path.join(root, "pages")
    # synthetic pages, all JVM expressions: lon/lat from the same integer
    # hash recipe as the batch fixtures, ts over 48 hourly windows
    lon = ((F.col("id") * 7919) % 2000) / 100.0 - 10.0
    lat = ((F.col("id") * 104729) % 2000) / 100.0 - 10.0
    ts = F.to_timestamp(F.lit("2025-06-01 00:00:00")) + \
        F.make_interval(hours=(F.col("id") % 48).cast("int"))
    (spark.range(N).repartition(64)
     .select(F.format_string("https://ex.com/p%09d", F.col("id")).alias("url"),
             ts.alias("warc_ts"),
             F.lit(None).cast("binary").alias("html"),
             F.format_string("page body geo:%.2f,%.2f end",
                             lat, lon).alias("text"),
             F.lit("en").alias("lang"))
     .write.mode("overwrite").parquet(src))

    from spandex_spark.streaming.ingest import stream_zone_rates
    zones = zones_df(spark)
    t0 = time.time()
    q = stream_zone_rates(spark, src, zones, gazetteer=None,
                          window="1 hour", watermark="2 hours",
                          query_name="bench_rates")
    q.awaitTermination()
    wall = time.time() - t0
    out = spark.sql("SELECT sum(n_pages) AS n, count(*) AS groups "
                    "FROM bench_rates").collect()[0]
    print(json.dumps({
        "metric": "stream_zone_rates pages/sec (geotag+PIP+windowed agg, "
                  "availableNow over parquet source)",
        "pages": N, "tagged_pages": int(out["n"]),
        "window_groups": int(out["groups"]),
        "wall_sec": round(wall, 3),
        "pages_per_sec": round(N / wall, 1),
        "cpus": int(CPUS),
    }))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
