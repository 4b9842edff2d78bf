"""Streaming geofence-transition throughput: zone_transitions
(applyInPandasWithState per-entity zone-change detection) driven
availableNow over a synthetic tagged-event directory; reports events/sec
— the companion number to bench_stateful.py's dedup_first_seen.

Events are generated JVM-side: N rows over E entities random-walking
across 16 zones.  The stream drops cross-batch late rows by contract,
so the source is written as 8 SEQUENTIAL append chunks in ts order
(file-source ordering is by modification time): every event arrives
in-order, the run is lossless, and the measured work is the
change-detection kernel, not the late-drop filter.  Losslessness is
asserted against the zone_transitions_batch twin on the same rows.

Usage: python scripts/bench_geofence.py [n_events] [n_entities]
(default 2,000,000 / 100,000). Prints one JSON line; copy numbers into
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
E = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
CHUNKS = 8
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import functions as F
    from spandex_spark.session import get_spark
    from spandex_spark.streaming.geofence import (zone_transitions,
                                                  zone_transitions_batch)

    spark = get_spark("bench_geofence", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS) * 2, 16))
    root = tempfile.mkdtemp(prefix="geofence_bench_")
    src = os.path.join(root, "events")
    os.makedirs(src)

    def events(lo, hi):
        # per-entity in-order ts (seq = id // E); zone changes ~half the
        # steps (xxhash parity picks "move" vs "stay at the epoch zone")
        ts = F.to_timestamp(F.lit("2025-06-01 00:00:00")) + \
            F.make_interval(secs=(F.col("id") / E).cast("int"))
        return (spark.range(lo, hi).select(
            F.format_string("u%07d", F.col("id") % E).alias("user_id"),
            ts.alias("ts"),
            F.when((F.xxhash64("id") % 2) == 0,
                   F.abs(F.xxhash64("id")) % 16)
            .otherwise(F.abs(F.xxhash64(F.col("id") - (F.col("id")
                             % (2 * E)))) % 16).alias("zone_id")))

    step = N // CHUNKS
    for c in range(CHUNKS):
        (events(c * step, (c + 1) * step).repartition(16)
         .write.mode("append").parquet(src))
        time.sleep(1.1)   # distinct modTime per chunk => in-order waves

    stream = (spark.readStream
              .schema("user_id string, ts timestamp, zone_id long")
              .option("maxFilesPerTrigger", 16).parquet(src))
    out = zone_transitions(stream)
    t0 = time.time()
    q = (out.writeStream.format("memory").queryName("bench_gf")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    kept = spark.sql("SELECT count(*) AS n FROM bench_gf").collect()[0]
    expected = zone_transitions_batch(events(0, N)).count()
    print(json.dumps({
        "metric": "zone_transitions events/sec (availableNow, in-order "
                  "parquet chunks)",
        "events": N, "entities": E, "transitions": int(kept["n"]),
        "transitions_expected_batch_twin": int(expected),
        "lossless": int(kept["n"]) == int(expected),
        "wall_sec": round(wall, 3), "events_per_sec": round(N / wall, 1),
        "cpus": int(CPUS),
    }))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
