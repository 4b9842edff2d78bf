"""1-D interval (range) join — the GeoIP / effective-dated-lookup shape.

Reference semantics: PostGIS-era pipelines express "which interval does
this value fall in" as ``JOIN ON v BETWEEN lo AND hi`` (the reference's
SQL-template style, spandex/spatialtoolz.py delegates all predicates to
the database). Canonical instances at web scale: IPv4-as-uint32 →
geolocation range tables (MaxMind-style), port/status-class buckets,
scored-document → quality-band lookups. Naively this is a cross join
with a filter — O(facts × intervals) — which is exactly the plan Spark
picks for a raw non-equi theta join (BroadcastNestedLoopJoin at best).

Spark realization — the 1-D analog of the engine's two-phase cell join
(operators/tag.py): discretize, equi-join, refine.

* pick a ``bin_size``; every value belongs to bin ``floor(v / bin)``;
* each interval explodes to the bins it overlaps via
  ``sequence(floor(lo/bin) .. floor(hi/bin))`` — plain JVM Column
  arithmetic, no Python;
* facts equi-join intervals on the bin key (hash join, map-side
  prunable, AQE-coalesced) and the exact ``BETWEEN`` predicate refines.
  A (fact, interval) pair can only meet in the fact's own bin, so the
  join emits no duplicates by construction — no distinct needed.

Skew / fan-out contract: explode cost per interval is
``width / bin_size``; a handful of continent-wide outlier ranges would
multiply rows pointlessly. Intervals wider than
``wide_bins_cap * bin_size`` are therefore routed to a separate
**broadcast** branch (few by assumption — that is what makes them
"wide outliers"), joined by the raw BETWEEN predicate against
``broadcast(wide)``, and unioned back. Both branches stay whole-stage
codegen; the only shuffle is the bin equi-join.

``bin_size=None`` derives a bin from the interval-width distribution
(median width — one tiny aggregation over the interval side only,
never the fact side), so callers with a tracked table can also pass an
explicit value and run zero preliminary jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def _median_width(intervals: DataFrame, lo_col: str, hi_col: str) -> float:
    # collect-ok: single aggregated row (median interval width) used to
    # pick the bin size; never touches the fact side
    row = intervals.select(
        F.expr(f"percentile_approx({hi_col} - {lo_col}, 0.5)").alias("m"),
    ).collect()[0]  # collect-ok: single aggregated row (median width probe)
    m = row["m"]
    if m is None or float(m) <= 0.0:
        return 1.0
    return float(m)


def interval_join(facts: DataFrame, intervals: DataFrame, *,
                  value_col: str, lo_col: str, hi_col: str,
                  how: str = "inner", fact_id_col: str | None = None,
                  bin_size: float | None = None,
                  wide_bins_cap: int = 64,
                  broadcast_intervals: bool = False) -> DataFrame:
    """All (fact, interval) pairs with ``lo <= value <= hi`` (SQL
    BETWEEN semantics, both ends inclusive — the oracle is literally
    ``JOIN ON f.v BETWEEN i.lo AND i.hi``).

    ``how='inner'`` emits matching pairs; ``how='left'`` keeps unmatched
    facts with NULL interval columns (the GeoIP "unknown location" row)
    and requires ``fact_id_col`` — a non-null unique fact key the miss
    recovery anti-joins on (anti-joining on every fact column would
    mis-handle NULLs in passthrough columns). Overlapping intervals are
    legal: a fact matches every interval that covers it.

    ``broadcast_intervals=True`` skips binning entirely and broadcasts
    the whole interval side (correct call when the range table is a few
    thousand rows); the default binned path is the 10^9-interval scale
    shape. ``wide_bins_cap`` bounds per-interval explode fan-out; wider
    intervals ride a broadcast branch (see module docstring).

    Column-name contract: fact columns pass through; interval columns
    join alongside (names must not collide — rename upstream, the
    engine's convention everywhere else).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    overlap = set(facts.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)};"
                         " rename before joining")
    if "_bin" in facts.columns or "_bin" in intervals.columns:
        raise ValueError("'_bin' is reserved by interval_join; rename it")

    v = F.col(value_col)
    between = v.between(F.col(lo_col), F.col(hi_col))

    if broadcast_intervals:
        # plain BroadcastNestedLoopJoin either way — no miss-recovery
        # key needed on this path
        joined = facts.join(F.broadcast(intervals), on=between, how=how)
        return joined
    if how == "left" and fact_id_col is None:
        raise ValueError("how='left' requires fact_id_col (a non-null "
                         "unique fact key for miss recovery)")

    if bin_size is None:
        bin_size = _median_width(intervals, lo_col, hi_col)
    b = F.lit(float(bin_size))

    n_bins = (F.floor(F.col(hi_col) / b) - F.floor(F.col(lo_col) / b) + 1)
    narrow = intervals.where(n_bins <= F.lit(wide_bins_cap))
    wide = intervals.where(n_bins > F.lit(wide_bins_cap))

    exploded = narrow.withColumn(
        "_bin", F.explode(F.sequence(F.floor(F.col(lo_col) / b),
                                     F.floor(F.col(hi_col) / b))))
    fb = facts.withColumn("_bin", F.floor(v / b))

    hit = (fb.join(exploded, on=["_bin"], how="inner")
           .where(between).drop("_bin"))
    wide_hit = fb.drop("_bin").join(F.broadcast(wide), on=between,
                                    how="inner")
    matched = hit.unionByName(wide_hit)

    if how == "inner":
        return matched
    # left: anti-join on the unique fact key recovers facts no interval
    # covered, NULL-padded to the interval schema.  `matched` feeds both
    # the union and the anti-join's right side — persist so the
    # explode+shuffle+refine subtree materializes once instead of
    # executing twice (a diamond DAG gets no ReusedExchange across the
    # differing projections).
    matched = matched.persist()
    misses = facts.join(matched.select(fact_id_col), on=[fact_id_col],
                        how="left_anti")
    for c, t in intervals.dtypes:
        misses = misses.withColumn(c, F.lit(None).cast(t))
    return matched.unionByName(misses)
