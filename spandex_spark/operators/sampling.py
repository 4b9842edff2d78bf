"""Deterministic corpus sampling — the cap-per-domain / fixed-fraction
primitives every training-data pipeline needs (no reference analog;
part of the web-scale graft's toolbox, SURVEY.md §11).

Both operators order/score rows by ``md5(seed || id)`` instead of a
native RNG or xxhash: md5 is bit-identical in Spark, DuckDB, Postgres
and every other SQL engine, so an oracle replicates the EXACT row
selection — sampling that cannot be cross-checked row-for-row is a
silent-drift hazard in a pipeline that reruns for years. md5 costs
more cycles than xxhash64, but the hash is one pass over a short id
string — noise next to the shuffle it feeds.

Scale shapes: `stratified_sample` is ONE shuffle on the stratum key +
a per-stratum sort (row_number window) — the hottest stratum bounds
the straggler, the same hot-key contract as `timeseries.sessionize`;
pre-filter with `sample_fraction` first when strata are huge and n is
small. `sample_fraction` is map-only: a lexicographic compare of a
hex prefix against a threshold string, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_col(id_col: str, seed: int):
    return F.md5(F.concat_ws("|", F.lit(str(seed)),
                             F.col(id_col).cast("string")))


def md5_prefix_long(col, seed: int):
    """First 8 md5 hex chars of ``seed || value`` as a long in
    [0, 16^8) — the module's engine-portable uniform hash in numeric
    form.  THE shared implementation: packing/dsir bucketing and the
    fractional-copy Bernoulli all route here, so the determinism
    contract ("bit-identical in any SQL engine") has exactly one
    definition to keep in sync."""
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def stratified_sample(df: DataFrame, *, strata_col: str, n: int,
                      id_col: str, seed: int = 42) -> DataFrame:
    """Keep the ``n`` rows per stratum with the smallest
    md5(seed||id) — a seeded pseudo-random, fully deterministic,
    engine-portable uniform sample without replacement per key (the
    per-domain cap). Strata smaller than ``n`` keep every row."""
    if n < 1:
        raise ValueError("n must be >= 1")
    w = (Window.partitionBy(strata_col)
         .orderBy(_hash_col(id_col, seed), F.col(id_col)))
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n).drop("_rk"))


def sample_fraction(df: DataFrame, *, fraction: float, id_col: str,
                    seed: int = 42) -> DataFrame:
    """Deterministic Bernoulli(fraction) by id: keep rows whose first
    8 md5 hex chars compare below ``floor(fraction · 16^8)`` — a pure
    string comparison (lowercase hex is lexicographically monotonic in
    value), map-only, no shuffle, identical row set in any engine.
    The SAME (id, seed) always lands the same way, so re-runs and
    incremental loads select consistently; use a different seed for an
    independent draw."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    thr = format(int(fraction * (16 ** 8)), "08x")
    if fraction >= 1.0:
        return df
    return df.filter(
        F.substring(_hash_col(id_col, seed), 1, 8) < F.lit(thr))


def stratified_fraction_sample(df: DataFrame, *, fractions: dict,
                               strata_col: str, id_col: str,
                               default: float = 0.0,
                               seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sampling — the corpus REBALANCING shape
    (e.g. keep 100% of low-resource languages, 3% of English; the
    CC-corpora language-rebalance every multilingual pretraining mix
    applies).  `fractions` maps stratum value -> keep fraction; strata
    not listed keep `default` (0.0 = drop, the rebalance convention —
    explicit is better than silently keeping unlisted tails).

    Same determinism contract as sample_fraction: md5(seed||id) hex
    compare, map-only, zero shuffle, row-for-row reproducible in any
    SQL engine — so the exact output set is oracle-checkable and
    stable across reruns/backfills.  The per-stratum threshold rides a
    literal CASE map (create_map), pure codegen."""
    for k, v in fractions.items():
        if not 0.0 <= float(v) <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1]")
    if not 0.0 <= default <= 1.0:
        raise ValueError("default must be in [0, 1]")
    def _thr(v: float) -> str:
        # fraction 1.0 would format as 9 hex chars and BREAK the string
        # compare ('1a..' > '100000000' char-wise); 'g' sorts above
        # every hex digit, so it means keep-all
        return "g" if float(v) >= 1.0 else \
            format(int(float(v) * (16 ** 8)), "08x")

    pairs = []
    for k, v in fractions.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(_thr(v)))
    dthr = F.lit(_thr(default))
    thr = F.coalesce(F.create_map(*pairs)[F.col(strata_col)], dthr) \
        if pairs else dthr
    return df.filter(
        F.substring(_hash_col(id_col, seed), 1, 8) < thr)


def temperature_resample(df: DataFrame, *, source_col: str, id_col: str,
                         alpha: float, target_total: int,
                         seed: int = 42,
                         max_upsample: float = 8.0) -> DataFrame:
    """Temperature-based source mixing (the mC4 / XLM-R / multilingual-
    pretraining rebalance): resample so source i's share of the output
    is q_i ∝ (n_i / N)^alpha — alpha=1 keeps natural proportions,
    alpha=0 equalizes sources, the published operating points sit at
    0.3–0.7 (XLM-R uses 0.3).  Heads (big sources) downsample; tails
    UPSAMPLE by row duplication (floor copies + a deterministic
    md5 Bernoulli for the fractional copy), capped at ``max_upsample``
    copies per row (the standard guard against a 10-row source being
    asked for 10^6 duplicates).  Output adds a ``copy`` index
    (0-based) so downstream shuffles spread duplicates.

    Determinism contract of this module: per-source rates derive from
    exact counts, the fractional copy from md5(seed||id) — the exact
    output multiset is reproducible in any engine.  Scale shape: one
    count aggregate (source-table-sized, driver-side as a literal map
    — the model-artifact convention), then ONE map-side explode; no
    data-sized shuffle at all."""
    if alpha < 0.0:
        raise ValueError("alpha must be >= 0")
    if target_total < 1:
        raise ValueError("target_total must be >= 1")
    if max_upsample < 1.0:
        raise ValueError("max_upsample must be >= 1")
    counts = {r["s"]: r["n"] for r in
              df.groupBy(F.col(source_col).alias("s"))
              .agg(F.count("*").alias("n"))
              .collect()}  # collect-ok: source-table-sized count map (model artifact)
    if not counts:
        return df.withColumn("copy", F.lit(0)).limit(0)
    tot = sum(counts.values())
    qs = {s: (n / tot) ** alpha for s, n in counts.items()}
    z = sum(qs.values())
    rates = {s: min(float(max_upsample),
                    target_total * (q / z) / counts[s])
             for s, q in qs.items()}
    # NULL source is a real group (undetected language is a standard
    # mC4 bucket) but cannot be a map key — route it through a
    # dedicated WHEN branch instead of crashing in create_map/sorted
    null_rate = rates.pop(None, None)
    pairs = []
    for s, r in sorted(rates.items(), key=lambda t: str(t[0])):
        pairs.append(F.lit(s))
        pairs.append(F.lit(float(r)))
    mapped = F.create_map(*pairs)[F.col(source_col)] if pairs else F.lit(None)
    rate = (F.when(F.col(source_col).isNull(),
                   F.lit(float(null_rate)) if null_rate is not None
                   else F.lit(None).cast("double"))
            .otherwise(mapped))
    whole = F.floor(rate).cast("int")
    frac = rate - whole
    # fractional copy: the sample_fraction determinism contract, but
    # comparing the NUMERIC value of the md5 hex prefix (portable in
    # any engine with a hex parse)
    hnum = md5_prefix_long(F.col(id_col), seed).cast("double")
    extra = F.when(hnum < frac * F.lit(float(16 ** 8)), 1).otherwise(0)
    # guard BEFORE the explode: Spark's sequence(0, -1) yields a
    # DESCENDING [0, -1] range, not an empty one — unguarded, dropped
    # rows would come back with two phantom copies
    return (df.withColumn("_nc", whole + extra)
            .where(F.col("_nc") > 0)
            .withColumn("copy", F.explode(
                F.sequence(F.lit(0), F.col("_nc") - 1)))
            .drop("_nc"))
