"""Throughput for interval_join (operators/rangejoin.py) on local[32]:
the GeoIP shape — facts × range-table at three interval-side scales,
binned path vs the naive BroadcastNestedLoop BETWEEN plan Spark would
otherwise pick.  Same bench hygiene as bench_final_ops.py (one session,
serialized jobs, wall + derived throughput).

Run: python scripts/bench_rangejoin.py [--facts 20000000]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FACTS = int(sys.argv[sys.argv.index("--facts") + 1]) \
    if "--facts" in sys.argv else 20_000_000


def main():
    from pyspark.sql import functions as F

    from spandex_spark.operators.rangejoin import interval_join
    from spandex_spark.session import get_spark

    spark = get_spark("bench_rangejoin", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    DOMAIN = 4_294_967_296  # uint32 address space
    facts = spark.range(N_FACTS).select(
        F.col("id").alias("fid"),
        ((F.col("id") * F.lit(2654435761)) % F.lit(DOMAIN))
        .cast("long").alias("ip"))

    def ranges(n):
        w = DOMAIN // n
        return spark.range(n).select(
            F.col("id").alias("loc_id"),
            (F.col("id") * F.lit(w)).alias("lo"),
            (F.col("id") * F.lit(w) + F.lit(w // 2 - 1)).alias("hi"))

    for n_iv in (10_000, 100_000, 1_000_000):
        ivs = ranges(n_iv)
        bs = float(DOMAIN // n_iv)
        t0 = time.time()
        got = interval_join(facts, ivs, value_col="ip", lo_col="lo",
                            hi_col="hi", bin_size=bs).count()
        dt = time.time() - t0
        print(f"binned   n_iv={n_iv:>9,}: {dt:6.2f}s  "
              f"{N_FACTS/dt/1e6:6.2f}M facts/s  matched={got:,}",
              flush=True)

    # naive comparison point at the smallest range-table size only —
    # broadcast BETWEEN is a per-fact linear scan of all intervals
    ivs = ranges(10_000)
    t0 = time.time()
    got = interval_join(facts.limit(1_000_000), ivs, value_col="ip",
                        lo_col="lo", hi_col="hi",
                        broadcast_intervals=True).count()
    dt = time.time() - t0
    print(f"naive-bc n_iv=   10,000: {dt:6.2f}s  "
          f"{1_000_000/dt/1e6:6.2f}M facts/s  matched={got:,} "
          f"(1M-fact slice)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
