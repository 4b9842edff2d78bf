"""Distributed Bloom filter: crawl-scale "have we seen this URL?"
membership, built and probed entirely with JVM expressions.

The filter is a DataFrame of 64-bit words — ``(word_idx long, bits
long)`` — not a driver-side bitmap, so it scales past driver memory and
is itself a join target.  Build: k positions per key via
``xxhash64(key, i) pmod m`` → one explode (k× rows, k is 7-ish) → one
``bit_or`` aggregation on the word index.  Probe: the same k positions,
one join on ``word_idx`` (broadcast while the bitmap fits — m=2^31 bits
is 256 MiB — else a shuffle join co-partitioned on word_idx), then a
``bool_and`` rollup per key.  No Python crossing anywhere.

Crawl contract (the reason this exists at 10^12 pages): a Bloom "seen"
set never re-crawls a seen URL (zero false negatives by construction);
it drops ~fp_rate of genuinely-new URLs (false positives) — the
standard frontier trade, tunable via :func:`bloom_params`.

Scale notes (100 TB): the build shuffles (word_idx, mask) pairs —
k rows per key, 16 bytes each — and the filter occupies m/64 rows
regardless of corpus size.  Probing co-partitions both sides on
word_idx, so repeated probes against a persisted filter reuse its
partitioning.  Sizing: 10^12 keys at 1% fp needs m ≈ 9.6·10^12 bits
= 1.2 TB — shard by url host prefix (build one filter per shard
column value with ``extra_group_cols``) before that point.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_params(n_items: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """Standard optimal sizing: m = -n·ln(p)/ln(2)^2 bits, k = m/n·ln(2)
    hash functions (both rounded up / to nearest)."""
    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not (0.0 < fp_rate < 1.0):
        raise ValueError("fp_rate must be in (0, 1)")
    m = math.ceil(-n_items * math.log(fp_rate) / (math.log(2) ** 2))
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _positions(col: str, m_bits: int, k: int, seed: int):
    """k bit positions per row: xxhash64 over (value, probe-index,
    seed) folded into [0, m) — all codegen."""
    return F.array(*[
        F.pmod(F.xxhash64(F.col(col), F.lit(int(seed)), F.lit(i)),
               F.lit(int(m_bits)))
        for i in range(k)])


def bloom_build(df: DataFrame, col: str, *, m_bits: int, k: int = 7,
                seed: int = 42,
                extra_group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Build the filter over ``df[col]``: one explode + one bit_or
    aggregation.  ``extra_group_cols`` shards the filter (one
    independent bitmap per group value) for beyond-single-filter
    corpora.  Output: ``extra_group_cols + (word_idx, bits)``."""
    if m_bits < 64:
        raise ValueError("m_bits must be >= 64")
    pos = F.explode(_positions(col, m_bits, k, seed)).alias("_pos")
    exploded = df.select(*extra_group_cols, pos)
    mask = F.expr("shiftleft(1L, CAST(pmod(_pos, 64) AS INT))")
    return (exploded
            .select(*extra_group_cols,
                    F.shiftright("_pos", 6).alias("word_idx"),
                    mask.alias("_mask"))
            .groupBy(*extra_group_cols, "word_idx")
            .agg(F.bit_or("_mask").alias("bits")))


def bloom_probe(df: DataFrame, col: str, bloom: DataFrame, *,
                id_col: str, m_bits: int, k: int = 7, seed: int = 42,
                broadcast_filter: bool = True) -> DataFrame:
    """Membership test per row of ``df``.  Returns
    ``(id_col, col, maybe_seen)`` — ``maybe_seen`` is true iff every
    probed bit is set (false ⇒ definitely never inserted).

    ``broadcast_filter=True`` (default) broadcasts the bitmap — right
    while m/8 fits an executor (≤ a few hundred MiB); pass False at
    frontier scale to shuffle-join on word_idx instead.

    A SHARDED filter (built with ``extra_group_cols``) probes as the
    UNION of its shards: duplicate word_idx rows bit_or-merge before
    the join, so no false negatives ever — at a union-level false
    positive rate.  (Joining each shard's duplicate rows directly
    would instead demand the bits in EVERY shard and readmit seen
    keys — found in review.)  For per-shard probing, filter the bloom
    frame to one shard first."""
    probes = (df
              .select(id_col, col,
                      F.explode(_positions(col, m_bits, k, seed))
                      .alias("_pos"))
              .select(id_col, col,
                      F.shiftright("_pos", 6).alias("word_idx"),
                      F.expr("shiftleft(1L, CAST(pmod(_pos, 64) AS INT))")
                      .alias("_mask")))
    filt = (bloom.select("word_idx", "bits")
            .groupBy("word_idx").agg(F.bit_or("bits").alias("bits")))
    if broadcast_filter:
        filt = F.broadcast(filt)
    hit = (F.col("bits").isNotNull()
           & (F.col("bits").bitwiseAND(F.col("_mask")) == F.col("_mask")))
    return (probes
            .join(filt, "word_idx", "left")
            .groupBy(id_col, col)
            .agg(F.bool_and(hit).alias("maybe_seen")))


def bloom_unseen(df: DataFrame, col: str, bloom: DataFrame, *,
                 id_col: str, m_bits: int, k: int = 7, seed: int = 42,
                 broadcast_filter: bool = True) -> DataFrame:
    """Frontier filter: rows of ``df`` whose ``col`` is definitely NOT
    in the seen-set (drops ~fp_rate of genuinely-new keys, never
    readmits a seen one)."""
    seen = bloom_probe(df, col, bloom, id_col=id_col, m_bits=m_bits,
                       k=k, seed=seed, broadcast_filter=broadcast_filter)
    return (df.join(seen.filter(~F.col("maybe_seen"))
                    .select(id_col), id_col, "semi"))
