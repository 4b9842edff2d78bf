"""E3 — explicit mega-cell skew handling.

Skew in spatial joins is SEMANTIC — a dense city cell holds a huge share of
the points — and is known before the shuffle, so the primary mitigation is
explicit: build a cell histogram, pick cells above a threshold, salt the
point side (pmod(xxhash64(id), S)) and fan the polygon side out xS for
exactly those cells. AQE's skew-join splitting stays on as the backstop
for residual skew (session.py).

The salted join is result-identical to the unsalted one (tested on the
FIXTURES.md §7 skewed fixture) — salting only re-buckets the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_histogram(points_with_cell: DataFrame, *, sample: float | None = None) -> DataFrame:
    df = points_with_cell
    if sample:
        df = df.sample(sample, seed=42)
    return df.groupBy("cell").agg(F.count("*").alias("n"))


def hot_cells(points_with_cell: DataFrame, *, threshold_rows: int,
              sample: float | None = None) -> list[int]:
    """Cells whose row count exceeds ``threshold_rows`` (scaled up if
    estimated from a sample)."""
    hist = cell_histogram(points_with_cell, sample=sample)
    scale = 1.0 / sample if sample else 1.0
    return [r.cell for r in
            hist.filter(F.col("n") * scale > threshold_rows).collect()]  # collect-ok: hot-cell list, tiny by threshold definition


def salted_cell_join(points: DataFrame, features_by_cell: DataFrame, *,
                     hot: list[int], fanout: int,
                     point_salt_col: str = "url",
                     num_partitions: int | None = None) -> DataFrame:
    """Equi-join points⋈features on `cell`, with rows in ``hot`` cells joined
    on (cell, salt) instead: point side gets salt = pmod(xxhash64(key), S);
    feature side is exploded xS for hot cells only. Identical results to the
    plain join; the hot cell's shuffle partition splits S ways.

    The point side is EXPLICITLY repartitioned by (cell, _salt) with a
    fixed partition count: AQE's partition coalescing sizes by shuffle
    BYTES, and a salted hot cell's buckets are small on the wire while
    their join OUTPUT is quadratic — left to the byte heuristic, AQE
    merges the salt buckets back into one partition and silently undoes
    the salting (measured: salted == unsalted wall time until the
    repartition was pinned). An explicit repartition count is exempt from
    AQE coalescing and satisfies the join's distribution requirement, so
    no extra exchange is added."""
    if not hot:
        return points.join(features_by_cell, "cell", "inner")
    hot_lit = F.array(*[F.lit(c) for c in hot])
    pts = points.withColumn(
        "_salt",
        F.when(F.array_contains(hot_lit, F.col("cell")),
               F.pmod(F.xxhash64(F.col(point_salt_col)), F.lit(fanout)))
         .otherwise(F.lit(0)))
    n_parts = num_partitions or max(
        4 * fanout, points.sparkSession.sparkContext.defaultParallelism * 2)
    pts = pts.repartition(n_parts, "cell", "_salt")
    feats = features_by_cell.withColumn(
        "_salt",
        F.explode(F.when(F.array_contains(hot_lit, F.col("cell")),
                         F.sequence(F.lit(0), F.lit(fanout - 1)))
                   .otherwise(F.array(F.lit(0)))))
    return pts.join(feats, ["cell", "_salt"], "inner").drop("_salt")
