"""line_dedup throughput evidence: C4-style corpus-wide line dedup over
a synthetic boilerplate-heavy crawl — the batch companion to the
stream/stateful dedup numbers in BENCH/BASELINE.md.

Corpus shape: N pages, each 10 lines = 7 unique (seeded per page) + 3
boilerplate lines shared corpus-wide (nav/cookie/footer — the removal
target). Expected outcome is closed-form: every page keeps its 7 unique
lines; the 3 boilerplate lines survive only on the single
first-occurrence page; asserts before reporting.

Usage: python scripts/bench_linededup.py [n_pages]   (default 1,000,000)
Prints one JSON line; copy into BENCH/BASELINE.md manually.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ATTEMPTS = int(os.environ.get("SPANDEX_BENCH_ATTEMPTS", "3"))


def main():
    from pyspark.sql import functions as F

    from spandex_spark.operators.dedup import line_dedup
    from spandex_spark.session import get_spark

    spark = get_spark("bench_linededup", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS), 16))
    uniq = F.transform(
        F.sequence(F.lit(0), F.lit(6)),
        lambda i: F.concat(F.lit("unique line "), i.cast("string"),
                           F.lit(" of page "),
                           F.sha2(F.concat(F.col("id").cast("string"),
                                           i.cast("string")), 256)))
    boiler = F.array(F.lit("ACCEPT ALL COOKIES TO CONTINUE BROWSING"),
                     F.lit("HOME | NEWS | SPORT | WEATHER | CONTACT US"),
                     F.lit("(c) example media group all rights reserved"))
    pages = (spark.range(N).repartition(int(CPUS) * 2)
             .select(F.col("id").alias("doc_id"),
                     F.concat_ws("\n", F.concat(boiler, uniq))
                      .alias("text")))

    times = []
    for _ in range(ATTEMPTS):
        t0 = time.monotonic()
        agg = (line_dedup(pages)
               .agg(F.sum("n_lines_kept").alias("kept"),
                    F.sum("n_lines_dropped").alias("dropped"))
               .collect()[0])
        times.append(time.monotonic() - t0)
    # closed form: 7N unique + 3 first-occurrence survivors
    assert agg["kept"] == 7 * N + 3, agg
    assert agg["dropped"] == 3 * (N - 1), agg
    best = min(times)
    print(json.dumps({
        "n_pages": N, "n_lines": 10 * N, "cpus": int(CPUS),
        "attempts_sec": [round(t, 3) for t in times],
        "best_sec": round(best, 3),
        "pages_per_sec": round(N / best),
        "lines_per_sec": round(10 * N / best)}))


if __name__ == "__main__":
    main()
