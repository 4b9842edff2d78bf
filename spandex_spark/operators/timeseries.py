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


def asof_join(left: DataFrame, right: DataFrame, *, on: str = "ts",
              by: str = "user_id",
              right_cols: tuple[str, ...] = ()) -> DataFrame:
    """Backward as-of join: each left row picks the LATEST right row with
    ``right.on <= left.on`` within the same ``by`` group (the
    point-in-time lookup every event pipeline needs; PostgreSQL/PostGIS has
    no native ASOF — the reference would emulate it with a correlated
    subquery).

    Spark realization (the scale shape): tag both sides, union, ONE window
    over (by, on) carrying the right columns forward with
    last(ignorenulls) — a single shuffle on the group key, no range join
    explosion, no per-group collect. Right rows must be unique per
    (by, on); pre-aggregate them if not (determinism).

    Returns all left columns + right_cols (NULL when no right row precedes).
    """
    clash = set(right_cols) & (set(left.columns) - {by, on})
    if clash:
        # mirrors pandas merge_asof suffix handling: overlapping value
        # columns must be renamed by the caller, or the left column would be
        # silently overwritten with the carried right value
        raise ValueError(
            f"right_cols {sorted(clash)} collide with left columns; "
            "rename them before the as-of join")
    l = left
    for c in right_cols:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    l = l.withColumn("_side", F.lit(1))
    r = right.select(by, on, *right_cols)
    for c in left.columns:
        if c not in (by, on):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.withColumn("_side", F.lit(0)).select(*l.columns)
    unioned = l.unionByName(r)
    # right rows sort BEFORE left rows at equal ts → "<=" semantics
    w = (Window.partitionBy(by)
         .orderBy(F.col(on).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in right_cols:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return unioned.filter(F.col("_side") == 1).drop("_side")


from pyspark.sql import Window  # noqa: E402
