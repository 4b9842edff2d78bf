"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
NeurIPS): select raw web documents whose hashed-n-gram distribution
looks like a target corpus, by importance weights between two bag-of-
n-grams unigram models.  THE published cheap alternative to
classifier-based quality filtering (quality_model.py) and the
retrieval shape of bm25_rank — no reference analog (spandex has no
text surface, SURVEY.md §1.1); part of the web-scale graft's toolbox.

Math (the paper's hashed generative model): each document featurizes
to word n-grams (1..n) hashed into ``buckets`` integer buckets; the
target and raw corpora each fit a multinomial over buckets with
add-``alpha`` smoothing; a document's importance log-weight is

    log w(x) = sum_{g in grams(x)} [log p_target(b(g)) - log p_raw(b(g))]

and selection is Gumbel-top-k over log w (noisy=True, the paper's
resampling) or plain top-k (noisy=False, deterministic head).

Determinism & oracle-ability: gram hashing and the Gumbel noise both
derive from md5 (`sampling.py` convention — bit-identical in every SQL
engine), so bucket assignment, weights, and the sampled set are all
replicable row-for-row outside Spark.  xxhash64 would be cheaper per
gram; md5 is one pass over short strings and noise next to the explode
it feeds — portability wins (the packing.py trade).

Scale shapes: featurization explodes to the gram stream (token-sized —
the price of the model, same flow as search.py's pruned explode but
unpruned here because every gram scores); bucket counts collapse
map-side into a ``buckets``-sized table that BROADCASTS back onto the
gram stream; the only data-sized shuffle is the per-document weight
sum.  The target corpus is typically tiny (Wikipedia-sized) next to
raw; both sides reduce to the same bucket-sized profile before
anything joins.  `dsir_sample` is a TakeOrdered head, never a full
sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dsir_weights", "dsir_sample"]


def _tokens(text_col: str):
    return F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                        r"[^0-9a-z]+", " ")), " "),
        lambda t: t != "")


def _joiner(toks, k: int):
    # a SINGLE-parameter lambda for F.transform: a two-parameter one
    # (e.g. the lambda i, k=k default-arg idiom) is interpreted by
    # PySpark as (element, index) and silently receives the array
    # index as the second argument
    def j(i):
        return F.array_join(F.slice(toks, i, k), " ")
    return j


def _grams(toks, ngram: int):
    """Word 1..n-grams as one flat array, space-joined."""
    parts = []
    for k in range(1, ngram + 1):
        parts.append(F.when(
            F.size(toks) >= k,
            F.transform(F.sequence(F.lit(1), F.size(toks) - k + 1),
                        _joiner(toks, k))
        ).otherwise(F.array().cast("array<string>")))
    return F.flatten(F.array(*parts))


def _bucket(gram_col, buckets: int, seed: int):
    from spandex_spark.operators.sampling import md5_prefix_long
    return md5_prefix_long(gram_col, seed) % buckets


def _bucket_counts(corpus: DataFrame, text_col: str, ngram: int,
                   buckets: int, seed: int) -> DataFrame:
    # tokens MATERIALIZED as a column before the gram transforms read
    # them: inlined, every slice() in the gram lambdas re-evaluates the
    # whole regexp+split — O(n²) string work per doc (the
    # substring_dedup pathology; bench-measured 145 docs/s before,
    # see BENCH/BASELINE.md)
    g = (corpus.select(_tokens(text_col).alias("_tk"))
         .select(F.explode(_grams(F.col("_tk"), ngram)).alias("_g"))
         .select(_bucket(F.col("_g"), buckets, seed).alias("_b")))
    return g.groupBy("_b").agg(F.count("*").alias("_cnt"))


def dsir_weights(raw: DataFrame, target: DataFrame, *,
                 id_col: str = "doc_id", text_col: str = "text",
                 ngram: int = 2, buckets: int = 10_000,
                 alpha: float = 1.0, seed: int = 42) -> DataFrame:
    """Append ``log_weight`` (and ``n_grams``) to ``raw``: the DSIR
    importance log-weight of each document against ``target``.
    Documents with zero grams (empty/NULL text) get log_weight NULL —
    the model says nothing about them; filter or keep by policy."""
    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    tc = _bucket_counts(target, text_col, ngram, buckets, seed)
    rc = _bucket_counts(raw, text_col, ngram, buckets, seed)
    t_tot = tc.agg(F.sum("_cnt")).collect()[0][0] or 0  # collect-ok: 1-row corpus gram total
    r_tot = rc.agg(F.sum("_cnt")).collect()[0][0] or 0  # collect-ok: 1-row corpus gram total
    # bucket-sized log-ratio table; buckets never seen in either corpus
    # still get the smoothed ratio via the outer join + coalesce
    lam = (tc.withColumnRenamed("_cnt", "_ct")
           .join(rc.withColumnRenamed("_cnt", "_cr"), "_b", "full")
           .select("_b", (
               F.log((F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(alpha))
                     / F.lit(t_tot + alpha * buckets))
               - F.log((F.coalesce(F.col("_cr"), F.lit(0)) + F.lit(alpha))
                       / F.lit(r_tot + alpha * buckets))).alias("_lam")))
    grams = (raw.select(F.col(id_col).alias("_id"),
                        _tokens(text_col).alias("_tk"))
             .select("_id",
                     F.explode(_grams(F.col("_tk"), ngram)).alias("_g"))
             .select("_id", _bucket(F.col("_g"), buckets, seed).alias("_b")))
    w = (grams.join(F.broadcast(lam), "_b", "left")
         .groupBy("_id")
         .agg(F.sum("_lam").alias("log_weight"),
              F.count("*").alias("n_grams")))
    return (raw.join(w, raw[id_col] == w["_id"], "left")
            .drop("_id"))


def dsir_sample(weighted: DataFrame, *, n: int,
                id_col: str = "doc_id",
                weight_col: str = "log_weight",
                noisy: bool = True, seed: int = 42) -> DataFrame:
    """Select ``n`` documents by Gumbel-top-k over the importance
    log-weights (``noisy=True`` — each doc's key is log_weight + an
    md5-seeded Gumbel draw, equivalent to sampling WITHOUT replacement
    with probability proportional to weight), or the deterministic
    top-``n`` head (``noisy=False``).  NULL weights never selected.
    The head is a TakeOrdered (limit), not a full sort."""
    if n < 1:
        raise ValueError("n must be >= 1")
    key = F.col(weight_col)
    if noisy:
        u = (F.conv(F.substring(
            F.md5(F.concat_ws("|", F.lit(str(seed)),
                              F.col(id_col).cast("string"))), 1, 12),
            16, 10).cast("double") + F.lit(1.0)) / F.lit(16.0 ** 12 + 2.0)
        key = key - F.log(-F.log(u))
    return (weighted.where(F.col(weight_col).isNotNull())
            .withColumn("_key", key)
            .orderBy(F.col("_key").desc(), F.col(id_col).asc())
            .limit(n)
            .drop("_key"))
