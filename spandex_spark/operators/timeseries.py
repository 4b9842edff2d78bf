"""Hypertable-style time rollup: one pass producing aggregates at several
time granularities (the continuous-aggregate shape; no reference analog —
spandex has no time-series surface, SURVEY.md §1.1 — this is part of the
web-scale graft's pipeline toolbox).

Implemented as grouping over a truncated bucket per granularity expressed
with GROUPING SETS semantics: Spark computes partial aggregates once per
input row per granularity, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VALID = ("hour", "day", "week", "month")


def time_rollup(df: DataFrame, *, ts_col: str, value_col: str,
                granularities: tuple[str, ...] = ("hour", "day"),
                group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Aggregates (count/sum/avg/min/max) of ``value_col`` per time bucket
    at each granularity (+ optional extra group columns). Output:
    (granularity, bucket_start, *group_cols, n, v_sum, v_avg, v_min, v_max).
    """
    for g in granularities:
        if g not in _VALID:
            raise ValueError(f"granularity {g!r} not in {_VALID}")
    ts = F.col(ts_col).cast("timestamp")
    parts = []
    for g in granularities:
        bucket = F.date_trunc(g, ts).alias("bucket_start")
        agg = (df.groupBy(bucket, *[F.col(c) for c in group_cols])
               .agg(F.count("*").alias("n"),
                    F.round(F.sum(value_col), 6).alias("v_sum"),
                    F.round(F.avg(value_col), 6).alias("v_avg"),
                    F.min(value_col).alias("v_min"),
                    F.max(value_col).alias("v_max"))
               .withColumn("granularity", F.lit(g)))
        parts.append(agg)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("granularity", "bucket_start", *group_cols,
                      "n", "v_sum", "v_avg", "v_min", "v_max")
