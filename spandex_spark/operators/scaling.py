"""O8 — target scaling.

Reference semantics: spandex/targets/scaling.py::scale_to_targets — scale a
column within filter-defined segments so each segment's aggregate (sum or
mean) hits a control total, allocation proportional to current values.
Pure DataFrame math: segment aggregate → factor = target / current →
join factors back → col * factor. No UDFs, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scale_to_targets(df: DataFrame, value_col: str, targets: DataFrame, *,
                     segment_col: str, metric: str = "sum",
                     scaled_col: str | None = None) -> DataFrame:
    """``targets`` has (segment_col, target). Rows in segments without a
    target keep their value (factor 1.0)."""
    scaled_col = scaled_col or f"{value_col}_scaled"
    agg = F.sum(value_col) if metric == "sum" else F.avg(value_col)
    current = df.groupBy(segment_col).agg(agg.alias("_current"))
    factors = (current.join(F.broadcast(targets), segment_col, "left")
               .withColumn("_factor",
                           F.when(F.col("target").isNotNull() & (F.col("_current") != 0),
                                  F.col("target") / F.col("_current"))
                            .otherwise(F.lit(1.0)))
               .select(segment_col, "_factor"))
    return (df.join(F.broadcast(factors), segment_col, "left")
            .withColumn(scaled_col, F.col(value_col) * F.coalesce(F.col("_factor"), F.lit(1.0)))
            .drop("_factor"))
