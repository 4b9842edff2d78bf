"""Bitext mining — margin-scored cross-lingual pair extraction
(Artetxe & Schwenk 2019, ACL; the LASER/CCMatrix recipe): given two
embedded monolingual corpora, find translation pairs as mutual-ish
nearest neighbours scored by the RATIO MARGIN

    margin(x, y) = cos(x, y) / ((avgk_fwd(x) + avgk_bwd(y)) / 2)

where avgk_fwd(x) is the mean cosine of x's k nearest targets and
avgk_bwd(y) of y's k nearest sources.  The margin is the published fix
for HUB vectors — a target that is fairly close to *everything* wins
raw-cosine retrieval but has a large avgk_bwd denominator, so margin
demotes it (pytested on a planted hub).

No reference analog (spandex has no text surface, SURVEY.md §1.1);
part of the web-scale graft's toolbox — this is the step that turns a
crawled multilingual corpus into MT training pairs.

Composition, not a new kernel: both retrieval directions run through
the `similarity` ANN family (``ann=`` injects ann_lsh / ann_ivf /
ann_ivfpq for the 10^9-vector scale path; brute-force is the default
and the oracle).  Everything after retrieval is plain DataFrame
algebra: two query-sized mean aggregates, one broadcast-join margin
projection, one row_number window per selection side.  The k-NN lists
are the big flow — (pairs, cosine) rows, never vectors.

Strategies (the paper's): ``'forward'`` keeps the best-margin target
per source; ``'intersection'`` keeps pairs that are each other's best
(the high-precision CCMatrix default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spandex_spark.operators.similarity import ann_bruteforce

__all__ = ["mine_bitext"]


def mine_bitext(src: DataFrame, tgt: DataFrame, *, k: int = 4,
                src_id: str = "vec_id", tgt_id: str = "vec_id",
                src_vec: str = "embedding", tgt_vec: str = "embedding",
                strategy: str = "forward",
                threshold: float | None = None,
                ann=ann_bruteforce) -> DataFrame:
    """(src_id, tgt_id, cosine, margin) candidate translation pairs.
    ``threshold`` filters on margin (the paper operates at ~1.06);
    ``ann`` must return (query_id, rank, neighbor_id, cosine) like the
    `similarity` family.  Ids must be non-negative and < 2^62 (the
    internal even/odd remap doubles them; hash-derived ids should be
    masked to 62 bits upstream)."""
    if strategy not in ("forward", "intersection"):
        raise ValueError("strategy must be 'forward' or 'intersection'")
    if k < 1:
        raise ValueError("k must be >= 1")
    # the ANN family excludes equal-id pairs as self-matches (the
    # within-corpus dedup contract) — here the two corpora are
    # DIFFERENT tables whose id spaces may collide, and (i, i) is
    # typically the true pair.  Remap to disjoint even/odd spaces so
    # any injected ann works unchanged, and map back after retrieval.
    # cast to long BEFORE doubling: an IntegerType id >= 2^30 would wrap
    # under non-ANSI int32 multiplication and decode to the wrong
    # document (ADVICE r5)
    s2 = src.withColumn(src_id, F.col(src_id).cast("long") * 2)
    t2 = tgt.withColumn(tgt_id, F.col(tgt_id).cast("long") * 2 + 1)
    fwd = ann(s2, t2, k=k, q_id=src_id, c_id=tgt_id,
              q_vec=src_vec, c_vec=tgt_vec)
    bwd = ann(t2, s2, k=k, q_id=tgt_id, c_id=src_id,
              q_vec=tgt_vec, c_vec=src_vec)
    # decode with INTEGER shiftright, not `/ 2`: double division rounds
    # ids above 2^53 to the wrong document.  (Encode overflow bounds
    # ids to < 2^62 — the docstring contract.)
    fwd = fwd.select(F.shiftright(F.col("query_id"), 1).alias("query_id"),
                     F.shiftright(F.col("neighbor_id"), 1)
                     .alias("neighbor_id"), "cosine")
    bwd = bwd.select(F.shiftright(F.col("query_id"), 1).alias("query_id"),
                     F.shiftright(F.col("neighbor_id"), 1)
                     .alias("neighbor_id"), "cosine")
    avg_f = fwd.groupBy(F.col("query_id").alias("_s")).agg(
        F.avg("cosine").alias("_af"))
    avg_b = bwd.groupBy(F.col("query_id").alias("_t")).agg(
        F.avg("cosine").alias("_ab"))
    # candidate pairs: union of both retrieval directions (a true pair
    # missed by one direction's top-k can still surface via the other)
    cands = (fwd.select(F.col("query_id").alias("_s"),
                        F.col("neighbor_id").alias("_t"), "cosine")
             .unionByName(
                 bwd.select(F.col("neighbor_id").alias("_s"),
                            F.col("query_id").alias("_t"), "cosine"))
             .groupBy("_s", "_t").agg(F.max("cosine").alias("cosine")))
    scored = (cands.join(avg_f, "_s").join(avg_b, "_t")
              .select("_s", "_t", "cosine",
                      (F.col("cosine")
                       / ((F.col("_af") + F.col("_ab")) / 2))
                      .alias("margin")))
    wf = Window.partitionBy("_s").orderBy(F.col("margin").desc(),
                                          F.col("_t").asc())
    best_f = (scored.withColumn("_rk", F.row_number().over(wf))
              .where(F.col("_rk") == 1).drop("_rk"))
    if strategy == "forward":
        out = best_f
    else:
        wb = Window.partitionBy("_t").orderBy(F.col("margin").desc(),
                                              F.col("_s").asc())
        best_b = (scored.withColumn("_rk", F.row_number().over(wb))
                  .where(F.col("_rk") == 1)
                  .select("_s", "_t"))
        out = best_f.join(best_b, ["_s", "_t"])
    if threshold is not None:
        out = out.where(F.col("margin") >= threshold)
    return out.select(F.col("_s").alias(src_id if src_id != tgt_id
                                        else "src_id"),
                      F.col("_t").alias(tgt_id if src_id != tgt_id
                                        else "tgt_id"),
                      "cosine", "margin")
