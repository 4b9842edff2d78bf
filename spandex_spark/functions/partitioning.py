"""Exchange-shaping helpers (r6 optimization round).

``pre_group_repartition`` hash-partitions a frame by the keys an
immediately-following groupBy/Window uses, at the CLUSTER's core count
(``defaultParallelism``) instead of ``spark.sql.shuffle.partitions``.
The downstream operator's distribution requirement is then already
satisfied, so the plan still carries exactly ONE exchange — just with
R = cores reduce partitions rather than the session default.

Why: for exchanges whose payload is small (top-k windows, bucket
collect_lists, pair dedups), the cost is the M x R shuffle BLOCK COUNT
and reduce-task scheduling, not partition size (guide §2.2). On this
chassis R = cores measured ~1.6-2.6x faster than R = 4x cores for those
exchanges. The value scales with the cluster (defaultParallelism = total
executor cores), so nothing is tuned to local[32].

When NOT to use it: aggregations whose map-side partial step collapses
many rows per key (sums/counts over heavy fan-in) — pre-partitioning by
key disables the partial step and shuffles every input row. Use only
where the aggregation is holistic (collect_list/collect_set), a window,
or a dedup whose keys rarely repeat map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pre_group_repartition(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-partition ``df`` by ``cols`` into defaultParallelism
    partitions; a following groupBy/Window on the same keys reuses this
    exchange (no second one appears)."""
    nparts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(nparts, *cols)
