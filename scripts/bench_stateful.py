"""Streaming stateful-dedup throughput evidence: dedup_first_seen
(applyInPandasWithState first-seen-URL dedup) driven availableNow over a
synthetic duplicated-crawl directory; reports pages/sec through the
stateful operator — the companion number to stream_zone_rates in
BENCH/BASELINE.md.

Pages are generated JVM-side: N rows over N/DUP distinct urls (every url
recurs DUP times across the 64 source files, the recrawl shape the
operator exists for), timestamps spread so "earliest wins" is
non-trivial.

Usage: python scripts/bench_stateful.py [n_pages] [dup_factor]
(default 2,000,000 / 4). Prints one JSON line; copy numbers into
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
DUP = int(sys.argv[2]) if len(sys.argv) > 2 else 4
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import functions as F
    from spandex_spark.session import get_spark
    from spandex_spark.streaming.ingest import PAGES_SCHEMA
    from spandex_spark.streaming.stateful import dedup_first_seen

    spark = get_spark("bench_stateful", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS) * 2, 16))
    root = tempfile.mkdtemp(prefix="stateful_bench_")
    src = os.path.join(root, "pages")
    n_urls = N // DUP
    ts = F.to_timestamp(F.lit("2025-06-01 00:00:00")) + \
        F.make_interval(secs=(F.col("id") % 100_000).cast("int"))
    (spark.range(N).repartition(64)
     .select(F.format_string("https://ex.com/p%09d",
                             F.col("id") % n_urls).alias("url"),
             ts.alias("warc_ts"),
             F.lit(None).cast("binary").alias("html"),
             F.format_string("body of page %d", F.col("id")).alias("text"),
             F.lit("en").alias("lang"))
     .write.mode("overwrite").parquet(src))

    for strategy in ("earliest", "any"):
        stream = (spark.readStream.schema(PAGES_SCHEMA)
                  .option("maxFilesPerTrigger", 16)
                  .parquet(src))
        out = dedup_first_seen(stream, strategy=strategy)
        name = f"bench_dedup_{strategy}"
        t0 = time.time()
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        wall = time.time() - t0
        kept = spark.sql(f"SELECT count(*) AS n, count(DISTINCT url) AS u "
                         f"FROM {name}").collect()[0]
        print(json.dumps({
            "metric": f"dedup_first_seen[{strategy}] pages/sec "
                      "(availableNow over parquet source)",
            "pages": N, "distinct_urls": n_urls, "dup_factor": DUP,
            "kept_rows": int(kept["n"]), "kept_urls": int(kept["u"]),
            "wall_sec": round(wall, 3),
            "pages_per_sec": round(N / wall, 1),
            "cpus": int(CPUS),
        }))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
