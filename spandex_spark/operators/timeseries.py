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
              right_cols: tuple[str, ...] = (),
              bucket_seconds: int | None = None) -> DataFrame:
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

    ``bucket_seconds`` selects the SKEW-SAFE two-pass variant: the window
    partitions by (by, time-range bucket) so one pathological key no longer
    maps to one straggler task; values cross bucket boundaries via a tiny
    per-(key, bucket) carry table (see _asof_join_bucketed). Identical
    output, equality-tested in tests/test_operators.py.

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
    if bucket_seconds is not None:
        return _asof_join_bucketed(left, right, on=on, by=by,
                                   right_cols=right_cols,
                                   bucket_seconds=bucket_seconds)
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


def _asof_join_bucketed(left: DataFrame, right: DataFrame, *, on: str,
                        by: str, right_cols: tuple[str, ...],
                        bucket_seconds: int) -> DataFrame:
    """Skew-safe backward as-of join. The single-window path partitions by
    ``by`` alone, so one hot key (a bot user with 100 M events) becomes one
    straggler task. Here the window key is (by, floor(ts / bucket_seconds))
    — a hot key splits across its time range — and correctness across
    bucket boundaries comes from a carry table that is small by
    construction (one row per (key, bucket) that has right rows):

    pass 1  union + window over (by, bucket): right values carried forward
            WITHIN each bucket (rows whose predecessor is in an earlier
            bucket stay NULL for now);
    carry   per-(by, bucket) LAST right values (max_by over ts — right rows
            are unique per (by, ts) by contract), then a window over the
            per-bucket summary partitioned by ``by`` ordered by bucket,
            last(ignorenulls) over [unboundedPreceding, -1]: the latest
            right values from any STRICTLY EARLIER bucket. This window sees
            #buckets rows per key, not #events — the straggler bound;
    pass 2  join the carry on (by, bucket) — same key as pass 1's shuffle —
            and coalesce(in-bucket value, carry value).

    A right row in an earlier bucket always has ts < the left bucket's
    start <= left ts, so the carry never violates the <= rule; equal-ts
    rows share a bucket and resolve in pass 1 (right sorts first)."""
    bkt = F.floor(F.unix_timestamp(F.col(on).cast("timestamp"))
                  / F.lit(int(bucket_seconds)))
    l = left
    for c in right_cols:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    l = l.withColumn("_side", F.lit(1))
    r = right.select(by, on, *right_cols)
    for c in left.columns:
        if c not in (by, on):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.withColumn("_side", F.lit(0)).select(*l.columns)
    unioned = l.unionByName(r).withColumn("_bkt", bkt)
    w = (Window.partitionBy(by, "_bkt")
         .orderBy(F.col(on).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in right_cols:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    # carry: last right values per (by, bucket) that HAS right rows, then
    # for every left (by, bucket) the latest such summary from a STRICTLY
    # earlier bucket — union + window on the tiny summary table, with left
    # bucket-rows sorted BEFORE same-bucket summary rows so an equal-bucket
    # summary (not "earlier") is never picked up
    per_bkt = (right.withColumn("_bkt", bkt)
               .groupBy(by, "_bkt")
               .agg(F.max_by(F.struct(*[F.col(c) for c in right_cols]),
                             F.col(on)).alias("_vals")))
    need = unioned.filter(F.col("_side") == 1).select(by, "_bkt").distinct()
    cu = (per_bkt.withColumn("_o", F.lit(1))
          .unionByName(need.withColumn("_vals", F.lit(None)
                                       .cast(per_bkt.schema["_vals"].dataType))
                       .withColumn("_o", F.lit(0))))
    wn = (Window.partitionBy(by).orderBy(F.col("_bkt").asc(),
                                         F.col("_o").asc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (cu.withColumn("_carry",
                            F.last("_vals", ignorenulls=True).over(wn))
              .filter(F.col("_o") == 0).select(by, "_bkt", "_carry"))
    out = (unioned.filter(F.col("_side") == 1)
           .join(filled, [by, "_bkt"], "left"))
    for c in right_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col("_carry")[c]))
    return out.drop("_side", "_bkt", "_carry")


from pyspark.sql import Window  # noqa: E402


def sessionize(df: DataFrame, *, ts_col: str = "ts",
               by: str = "user_id", gap_seconds: float = 1800.0,
               order_cols: tuple[str, ...] = ()) -> DataFrame:
    """Gap-based sessionization (the web-analytics primitive; BigQuery/
    Snowflake express it with the same lag+running-sum idiom — there is
    no reference analog, spandex has no time-series surface, SURVEY.md
    §1.1): a new session starts at a row whose time since the PREVIOUS
    event of the same ``by`` key exceeds ``gap_seconds``.

    Arithmetic is integer MICROSECONDS (unix_micros / epoch_us) so a SQL
    oracle matches bit-for-bit — float epoch seconds round-trip
    differently between engines. Ties on ``ts_col`` are broken by
    ``order_cols`` (pass the event id for full determinism).

    Scale shape: ONE shuffle on ``by``; lag and the running sum share the
    window's partitioning+ordering so the sort is paid once. Key skew =
    hottest single user, the same contract as `asof_join`.

    Output: input columns + ``session_seq`` (1-based per key) +
    ``session_id`` ("<by>-<seq>")."""
    w = Window.partitionBy(by).orderBy(ts_col, *order_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    gap_us = int(round(gap_seconds * 1_000_000))
    is_new = F.when(prev.isNull() | ((us - prev) > F.lit(gap_us)),
                    F.lit(1)).otherwise(F.lit(0))
    seq = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("session_seq", seq.cast("long"))
            .withColumn("session_id",
                        F.concat_ws("-", F.col(by).cast("string"),
                                    F.col("session_seq").cast("string"))))


def session_stats(df: DataFrame, *, ts_col: str = "ts",
                  by: str = "user_id", gap_seconds: float = 1800.0,
                  order_cols: tuple[str, ...] = ()) -> DataFrame:
    """Session-level rollup over `sessionize`: one row per (key, session)
    with event count, start/end, and duration in integer microseconds.
    Same single shuffle — the groupBy key is a prefix of the window's
    partition key, so no second exchange."""
    s = sessionize(df, ts_col=ts_col, by=by, gap_seconds=gap_seconds,
                   order_cols=order_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (s.groupBy(by, "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 (F.max(us) - F.min(us)).alias("duration_us")))
