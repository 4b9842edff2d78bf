"""Optimization-round instrumentation (guide §1): per-query isolation for
the frozen bench.py queries — noop-sink timing (§1.4), job labels (§1.5),
and .explain("formatted") capture for plans/r06/.

This file is NOT the driver contract; bench.py stays frozen. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py [--plans-dir plans/r06 --suffix before] \
        [--only q1,q2] [--attempts 3] [--sink noop|count]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf type hints)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # the frozen harness: reuse its query defs verbatim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-dir", default=None,
                    help="write <query>_<suffix>.txt explain output here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None)
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--sink", default="count", choices=["noop", "count"])
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from spandex_spark.session import get_spark
    spark = get_spark("bench_extra", master=f"local[{bench.CPUS}]",
                      shuffle_partitions=max(int(bench.CPUS) * 4, 32))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(x: pd.Series) -> pd.Series:
        return x * 1.0

    spark.range(200_000).select(_warm(F.col("id").cast("double"))).count()
    bench.prepare_inputs(spark)

    queries = dict(bench.QUERIES)
    if args.only:
        queries = {k: v for k, v in queries.items()
                   if k in args.only.split(",")}

    times = {}
    samples = {}
    for name, fn in queries.items():
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, bench.SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans_dir,
                                   f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        best = None
        samples[name] = []
        for i in range(args.attempts):
            spark.sparkContext.setJobDescription(f"{name} attempt {i}")
            t0 = time.time()
            df = fn(spark, bench.SF_DIR)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            t = time.time() - t0
            samples[name].append(round(t, 3))
            best = t if best is None else min(best, t)
        times[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sink": args.sink, "best": times, "total": round(
        sum(times.values()), 3), "samples": samples}))
    spark.stop()


if __name__ == "__main__":
    main()
