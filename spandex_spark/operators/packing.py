"""Sequence packing — tokenized documents into fixed-length training
examples (no reference analog; part of the web-scale graft's toolbox,
SURVEY.md §11): the step between the token-count/BPE layer and the
trainer, where padding waste is decided.

Two published shapes, both here:

- ``pack_chunks`` — concat-and-chunk (the GPT/T5 pretraining default):
  documents are concatenated in a deterministic pseudo-shuffled order
  and the stream is cut every ``context_len`` tokens; documents
  straddle pack boundaries by design (the trainer masks or allows
  cross-document attention).  Zero padding except the final pack.
- ``pack_ffd`` — no-split first-fit-decreasing bin packing (the SFT /
  instruction-tuning shape, where an example must not be cut):
  every pack's token sum is <= ``context_len``, each document lands in
  exactly one pack.

Scale shapes.  The distributed prefix sum in ``pack_chunks`` is the
textbook two-level form: rows are hash-bucketed (md5 — the
engine-portable determinism convention of `sampling`), the per-bucket
running sum is a window PARTITIONED by bucket (parallel, never a
single global sort), and the B bucket totals — B rows, not data — come
to the driver once and go back as broadcast offsets.  The concat order
is therefore (bucket, id): deterministic given the data, and
pseudo-shuffled across the corpus, which is exactly what a trainer
wants (sequential corpus order is a curriculum bug, not a feature).
``pack_ffd`` packs within the same hash buckets via one
``applyInPandas`` pass per bucket — FFD's 11/9·OPT+1 guarantee holds
per bucket, waste stays O(buckets · context_len) corpus-wide, and no
global coordination exists at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_chunks", "pack_ffd"]


def _bucket(id_col: str, buckets: int, seed: int):
    # md5 over the id (sampling.md5_prefix_long — the ONE shared
    # definition): bit-identical in every SQL engine, so the bucket
    # assignment — and with it the whole concat order — is
    # oracle-replicable row for row.
    from spandex_spark.operators.sampling import md5_prefix_long
    return (md5_prefix_long(F.col(id_col), seed) % buckets).alias("_bkt")


def pack_chunks(df: DataFrame, *, context_len: int,
                id_col: str = "doc_id", len_col: str = "n_tokens",
                buckets: int = 64, seed: int = 42) -> DataFrame:
    """Concat-and-chunk packing: output one row per (pack, document)
    slice — (pack_id, id, begin, end) with token-index slice semantics
    ``[begin, end)`` into the document's own token sequence.  Every
    token position of every document is covered exactly once; every
    pack holds exactly ``context_len`` tokens except the last.

    The caller applies the slices to its token arrays (a join on
    ``id_col`` + ``slice(tokens, begin+1, end-begin)``) — this operator
    moves (id, begin, end) triples, never token payloads, so the wide
    exchange is 24 bytes per SLICE, not per token.

    Plan: one narrow shuffle (the bucket window), one B-row driver
    round-trip for bucket offsets, one JVM sequence() explode for the
    pack spans.  Zero Python operators (pytested)."""
    if context_len < 1:
        raise ValueError("context_len must be >= 1")
    L = F.lit(context_len).cast("long")
    base = (df.select(F.col(id_col).alias("_id"),
                      F.col(len_col).cast("long").alias("_n"),
                      _bucket(id_col, buckets, seed))
            .where(F.col("_n") > 0))
    w = (Window.partitionBy("_bkt").orderBy("_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = base.withColumn("_end_in_bkt", F.sum("_n").over(w))
    totals = (cum.groupBy("_bkt").agg(F.max("_end_in_bkt").alias("_tot"))
              .orderBy("_bkt")
              .collect())  # collect-ok: B bucket totals (B rows, not data)
    off, offsets = 0, {}
    for r in totals:
        offsets[r["_bkt"]] = off
        off += r["_tot"]
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    # global offset of the doc's first token in the concatenated stream
    g0 = (omap[F.col("_bkt")] + F.col("_end_in_bkt") - F.col("_n"))
    # INTEGER division (long `div`), not floor over a double quotient:
    # past 2^53 total tokens the double rounds onto the wrong pack and
    # breaks the exactly-once slice invariant (ADVICE r5). g0 >= 0, so
    # `div` (truncate) == floor.
    spans = cum.select("_id", "_n", g0.alias("_g0")).select(
        "_id", "_n", "_g0",
        F.explode(F.sequence(
            F.expr(f"_g0 div {int(context_len)}"),
            F.expr(f"(_g0 + _n - 1) div {int(context_len)}"))
        ).alias("pack_id"))
    return spans.select(
        F.col("pack_id").cast("long"),
        F.col("_id").alias(id_col),
        F.greatest(F.lit(0).cast("long"),
                   F.col("pack_id") * L - F.col("_g0")).alias("begin"),
        F.least(F.col("_n"),
                (F.col("pack_id") + 1) * L - F.col("_g0")).alias("end"))


def pack_ffd(df: DataFrame, *, context_len: int,
             id_col: str = "doc_id", len_col: str = "n_tokens",
             buckets: int = 64, seed: int = 42) -> DataFrame:
    """No-split packing: output (pack_id string, id, n_tokens) with
    every document in exactly one pack and every pack's token sum
    <= ``context_len``.  Documents LONGER than ``context_len`` raise —
    pre-split them with ``pack_chunks`` or truncate upstream; silently
    emitting an overflowing pack would corrupt a training run.

    First-fit-decreasing inside each md5 hash bucket (one
    ``applyInPandas`` pass over (id, n) pairs — token payloads never
    move); pack ids are ``"<bucket>-<k>"`` so buckets never collide.
    Deterministic: bucket assignment is md5-seeded, FFD scans lengths
    descending with id ascending as the tie break."""
    if context_len < 1:
        raise ValueError("context_len must be >= 1")
    base = (df.select(F.col(id_col).alias("_id"),
                      F.col(len_col).cast("long").alias("_n"),
                      _bucket(id_col, buckets, seed))
            .where(F.col("_n") > 0))
    L = context_len

    def _ffd(pdf):
        import pandas as pd
        too_big = pdf[pdf["_n"] > L]
        if len(too_big):
            raise ValueError(
                f"pack_ffd: document(s) longer than context_len={L} "
                f"(e.g. id={too_big['_id'].iloc[0]!r}, "
                f"n={int(too_big['_n'].iloc[0])}); pre-split with "
                "pack_chunks or truncate upstream")
        pdf = pdf.sort_values(["_n", "_id"],
                              ascending=[False, True])
        bkt = int(pdf["_bkt"].iloc[0])
        rooms, assign = [], []
        for n in pdf["_n"].to_numpy():
            n = int(n)
            for i in range(len(rooms)):      # first fit
                if rooms[i] >= n:
                    rooms[i] -= n
                    assign.append(i)
                    break
            else:
                rooms.append(L - n)
                assign.append(len(rooms) - 1)
        return pd.DataFrame({
            "pack_id": [f"{bkt}-{a}" for a in assign],
            "_id": pdf["_id"].to_numpy(),
            "_n": pdf["_n"].to_numpy()})

    out_schema = f"pack_id string, _id {dict(base.dtypes)['_id']}, _n long"
    return (base.groupBy("_bkt").applyInPandas(_ffd, out_schema)
            .select("pack_id", F.col("_id").alias(id_col),
                    F.col("_n").alias(len_col)))
