"""Measure spatial scan planning (read_bbox) against the full-scan
baseline at a deliberately large local scale.

Protocol (same hygiene as scripts/bench_scaling.py): one synthetic
20M-point table, compacted into 64 cell-sorted files; a city-block-ish
0.5 x 0.4 deg window; each variant timed over N_ATTEMPTS cold runs
(fresh action, cache-free), best-of reported. Run serialized — nothing
else on the box.

    python scripts/bench_scanplan.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_POINTS = int(os.environ.get("SCANPLAN_POINTS", 20_000_000))
N_ATTEMPTS = int(os.environ.get("SCANPLAN_ATTEMPTS", 3))
BBOX = (1.0, 2.0, 1.5, 2.4)


def main():
    import numpy as np
    from pyspark.sql import functions as F

    from spandex_spark.session import get_spark
    from spandex_spark.functions.cells_sql import cell_of_expr
    from spandex_spark.tables import IcebergishTable

    spark = get_spark("bench_scanplan", master="local[32]",
                      shuffle_partitions=32)
    # synthesize distributed (no driver-side numpy materialization)
    # carry a ~640-byte text payload per row (the Common-Crawl-page shape:
    # scan cost is dominated by the text column, not the coordinates)
    pts = (spark.range(N_POINTS)
           .select(F.col("id").alias("pid"),
                   (F.rand(7) * 20.0 - 10.0).alias("lon"),
                   (F.rand(13) * 20.0 - 10.0).alias("lat"),
                   F.repeat(F.sha2(F.col("id").cast("string"), 256), 10)
                    .alias("text")))
    pts = pts.withColumn("cell",
                         cell_of_expr(F.col("lon"), F.col("lat"), 12))
    t = IcebergishTable(tempfile.mkdtemp() + "/scanplan")
    t.append(pts)
    t.compact(spark, "cell", n_files=64)
    t.expire_snapshots(keep_last=0)

    minx, miny, maxx, maxy = BBOX
    exact = (F.col("lon").between(minx, maxx)
             & F.col("lat").between(miny, maxy))

    def _digest(df):
        # force the text column to be read for surviving row groups
        row = df.agg(F.count("*").alias("n"),
                     F.sum(F.length("text")).alias("b")).collect()[0]
        return (row["n"], row["b"])

    def run_full():
        return _digest(t.read(spark).filter(exact))

    def run_planned():
        return _digest(t.read_bbox(spark, BBOX, lon_col="lon",
                                   lat_col="lat"))

    # warm the JVM once on an unrelated action
    spark.range(1000).count()

    results = {}
    for name, fn in (("full_scan", run_full), ("read_bbox", run_planned)):
        times, counts = [], []
        for _ in range(N_ATTEMPTS):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            counts.append(fn())
            times.append(time.monotonic() - t0)
        results[name] = {"best_sec": round(min(times), 3),
                         "all_sec": [round(x, 3) for x in times],
                         "rows": counts[0][0], "text_bytes": counts[0][1]}
    assert results["full_scan"]["rows"] == results["read_bbox"]["rows"]
    results["files_planned"] = len(t.files_for_bbox(BBOX))
    results["files_total"] = len(t.files_for())
    results["n_points"] = N_POINTS
    results["speedup"] = round(results["full_scan"]["best_sec"]
                               / results["read_bbox"]["best_sec"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
