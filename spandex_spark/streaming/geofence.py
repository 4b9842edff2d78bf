"""Streaming geofence transitions: per-entity zone enter/exit events.

The live-alerting shape on top of the engine's streaming spatial join:
`stream_tag_pages`-style tagging (stateless broadcast cell join, inner
semantics) feeds this operator, which keeps one tiny state row per
entity — (last_zone, last_ts) — and emits a row ONLY when the entity's
zone changes.  Fleet tracking, store-visit attribution, and
page-locality drift (a host suddenly geotagging into a new region) are
all this operator.

Semantics and contracts:

* input rows carry (entity, ts, zone_id); zone_id comes from an
  upstream tagger.  Inner-tagged streams never contain
  "outside every fence" rows, so exits-to-outside are detected by
  state timeout instead: pass ``exit_after_minutes`` and an entity
  silent that long emits a final (last_zone → NULL) exit row and its
  state is evicted (the standard geofence dwell-timeout trade —
  exactness of exit timestamps for bounded state).
* late data: rows with ``ts`` at or before the entity's last processed
  ``ts`` are DROPPED (the watermark trade made explicit per entity;
  within a micro-batch rows are processed in ts order, so only
  cross-batch reordering is lossy).
* first sighting emits (NULL → zone) — the initial "enter".

State is O(entities), two scalars each; the only shuffle is the
groupBy(entity) that any per-entity stateful operator needs.  The
vectorized kernel does shift-compare on the sorted batch — no per-row
Python.

Batch twin: ``zone_transitions_batch`` computes the identical
(no-timeout) result with one lag window — the parity oracle in
tests/test_geofence.py and the backfill path for historical data.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["zone_transitions", "zone_transitions_batch"]


def _out_schema(entity_type: T.DataType) -> T.StructType:
    return T.StructType([
        T.StructField("entity", entity_type),
        T.StructField("ts", T.TimestampType()),
        T.StructField("from_zone", T.LongType()),
        T.StructField("to_zone", T.LongType()),
    ])


_STATE_SCHEMA = T.StructType([
    T.StructField("last_zone", T.LongType()),
    T.StructField("last_ts_us", T.LongType()),
])


def zone_transitions(tagged: DataFrame, *, entity_col: str = "user_id",
                     ts_col: str = "ts", zone_col: str = "zone_id",
                     exit_after_minutes: float | None = None) -> DataFrame:
    """Per-entity zone-change stream: (entity, ts, from_zone, to_zone).

    ``tagged`` is a streaming (or batch — applyInPandasWithState is
    streaming-only, use ``zone_transitions_batch`` there) DataFrame with
    the three columns above; extra columns are ignored.  See module
    docstring for the late-data and timeout contracts.
    """
    entity_type = dict(zip(tagged.schema.names,
                           [f.dataType for f in tagged.schema.fields],
                           strict=True))[entity_col]
    out_schema = _out_schema(entity_type)
    src = tagged.select(F.col(entity_col).alias("entity"),
                        F.col(ts_col).alias("ts"),
                        F.col(zone_col).cast("long").alias("zone_id"))

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            last_zone, last_ts_us = state.get
            state.remove()
            return iter([pd.DataFrame({
                "entity": [key[0]],
                "ts": [pd.Timestamp(last_ts_us, unit="us")],
                "from_zone": pd.array([last_zone], dtype="Int64"),
                "to_zone": pd.array([None], dtype="Int64")})])
        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.dropna(subset=["ts"]).sort_values("ts", kind="stable")
        ts_us = pdf["ts"].astype("int64") // 1000
        if state.exists:
            prev_zone, prev_ts_us = state.get
        else:
            prev_zone, prev_ts_us = None, None
        if prev_ts_us is not None:
            keep = ts_us > prev_ts_us          # late-data drop contract
            pdf, ts_us = pdf[keep], ts_us[keep]
        if len(pdf):
            # duplicate-ts rows within the batch: first one wins (same
            # rule the batch twin applies; see its docstring)
            first = ts_us.diff().fillna(1) > 0
            pdf, ts_us = pdf[first], ts_us[first]
        if len(pdf) == 0:
            if state.exists and exit_after_minutes:
                state.setTimeoutDuration(int(exit_after_minutes * 60_000))
            return iter(())
        zones = pdf["zone_id"].astype("Int64")
        prev = zones.shift(1)
        if prev_zone is not None:
            prev.iloc[0] = prev_zone
        changed = ~(zones.eq(prev).fillna(False)
                    | (zones.isna() & prev.isna()))
        out = pd.DataFrame({
            "entity": pdf["entity"][changed],
            "ts": pdf["ts"][changed],
            "from_zone": prev[changed],
            "to_zone": zones[changed]})
        state.update((None if zones.iloc[-1] is pd.NA
                      else int(zones.iloc[-1]), int(ts_us.iloc[-1])))
        if exit_after_minutes:
            state.setTimeoutDuration(int(exit_after_minutes * 60_000))
        return iter(()) if out.empty else iter([out])

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if exit_after_minutes
               else GroupStateTimeout.NoTimeout)
    return (src.groupBy("entity")
            .applyInPandasWithState(fn, outputStructType=out_schema,
                                    stateStructType=_STATE_SCHEMA,
                                    outputMode="append",
                                    timeoutConf=timeout))


def zone_transitions_batch(tagged: DataFrame, *, entity_col: str = "user_id",
                           ts_col: str = "ts",
                           zone_col: str = "zone_id") -> DataFrame:
    """Batch twin (and parity oracle): the same transitions via one lag
    window over (entity, ts) — no timeout exits (a batch has no clock).
    Duplicate-ts rows within an entity follow the same drop rule as the
    stream (only ONE row per (entity, ts) is observed) — which of the
    duplicates wins is input-order-dependent in both paths, so feed
    unique timestamps per entity when that matters.  NULL handling also
    mirrors the stream kernel: NULL-ts rows drop, and a NULL-zone first
    sighting emits nothing (the entity was never inside a fence)."""
    from pyspark.sql import Window
    src = (tagged.select(F.col(entity_col).alias("entity"),
                         F.col(ts_col).alias("ts"),
                         F.col(zone_col).cast("long").alias("zone_id"))
           .filter(F.col("ts").isNotNull())
           .withColumn("_rn", F.row_number().over(
               Window.partitionBy("entity", "ts").orderBy("ts")))
           .filter(F.col("_rn") == 1).drop("_rn"))
    w = Window.partitionBy("entity").orderBy("ts")
    lagz = F.lag("zone_id").over(w)
    lagseen = F.lag(F.lit(1)).over(w)
    changed = F.when(lagseen.isNull(), F.col("zone_id").isNotNull()) \
        .otherwise(~(F.col("zone_id").eqNullSafe(lagz)))
    return (src.withColumn("from_zone", lagz)
            .withColumn("_chg", changed)
            .filter(F.col("_chg"))
            .select("entity", "ts", "from_zone",
                    F.col("zone_id").alias("to_zone")))
