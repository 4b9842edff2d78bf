"""Distributed word n-gram language model with interpolated Kneser–Ney
smoothing — the KenLM/CCNet quality-filtering model, built and SERVED
as DataFrames (Brants et al. 2007's "distributed LM": the model is a
table you join against, not an artifact you broadcast).

``langmodel.train_char_lm`` is the bounded-sample, broadcast-model
path; this module is the opposite operating point — the model itself
is corpus-scale (word n-grams over 100 TB don't fit a closure), so
training is pure groupBy aggregation and scoring is one left join per
order.  That join chain IS the published serving architecture.

Formulas (interpolated KN, Chen & Goodman 1999, single discount D):

* level n (raw counts c):      pmass(g) = max(c(g)−D, 0) / denom(ctx)
* levels k<n (continuation):   c_KN(g)  = |{w₀ : c(w₀·g) > 0}| — one
  groupBy over the (k+1)-gram table's suffixes; same pmass formula.
* every level: λ(ctx) = D · N1+(ctx·) / denom(ctx), with denom(ctx) =
  Σ_w count(ctx·w) summed from the SAME table (definitional — avoids
  the end-of-text c(ctx) mismatch), N1+(ctx·) = rows per ctx.
* base: uniform 1/(V+1) (V seen types + one OOV slot), so every
  probability is strictly positive and Σ_w P(w|ctx) = 1 exactly —
  pytested against the whole vocabulary.
* unseen ctx at level k ⇒ pure backoff (pmass 0, λ 1): the left-join
  miss encodes it.

Tokenization: the textstats whitespace convention, lowercased;
documents pad with (n−1) ``<s>`` and close with ``</s>`` (predicted,
like KenLM).

Scale shape: training = n groupBy passes (the classic n-gram
MapReduce); scoring = explode positions + n hash joins co-keyed on the
(ctx, w) columns + one per-doc aggregate.  No Python anywhere.
No reference analog (spandex has no text surface, SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_kn_lm", "kn_prob", "kn_score"]

BOS, EOS = "<s>", "</s>"


def _tokens(text_col, n: int):
    """Padded lowercase token array: (n-1)×<s> + words + </s>."""
    words = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")),
                " "),
        lambda w: F.length(w) > 0)
    pad = F.array(*[F.lit(BOS)] * (n - 1))
    return F.concat(pad, words, F.array(F.lit(EOS)))


def _ngram_rows(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    """One (gram array<string>) row per n-gram position (prediction
    positions only: the first n-1 pure-padding grams are skipped by
    starting at the first real prediction)."""
    toks = _tokens(F.col(text_col), n)
    cnt = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(1), cnt)
    grams = F.transform(idx, lambda i: F.slice(toks, i, n))
    return docs.select(F.explode(grams).alias("gram"))


def _level_tables(grams: DataFrame, k: int, discount: float):
    """(pmass table, lambda table) for one order from its count table.
    ``grams``: (gram, c) distinct k-grams with (raw | continuation)
    counts."""
    ctx = F.slice("gram", 1, k - 1) if k > 1 else F.array().cast(
        "array<string>")
    w = F.element_at("gram", k)
    per = grams.select(ctx.alias("ctx"), w.alias("w"), F.col("c"))
    denom = (per.groupBy("ctx")
             .agg(F.sum("c").alias("denom"),
                  F.count("*").alias("n1plus")))
    pmass = (per.join(denom, "ctx")
             .select("ctx", "w",
                     (F.greatest(F.col("c") - F.lit(discount), F.lit(0.0))
                      / F.col("denom")).alias("pmass")))
    lam = denom.select(
        "ctx",
        (F.lit(discount) * F.col("n1plus") / F.col("denom")).alias("lam"))
    return pmass, lam


def train_kn_lm(corpus: DataFrame, *, text_col: str = "text", n: int = 3,
                discount: float = 0.75) -> dict:
    """Train the model; returns {"n", "discount", "V",
    "pmass": {k: DataFrame(ctx, w, pmass)},
    "lam": {k: DataFrame(ctx, lam)}} with every table
    localCheckpoint-materialized (they are reused once per scored
    order; callers persist longer-lived models via tables.py)."""
    if n < 2:
        raise ValueError("n must be >= 2")
    raw = (_ngram_rows(corpus, text_col, n)
           .groupBy("gram").agg(F.count("*").cast("double").alias("c"))
           .localCheckpoint(eager=True))
    counts = {n: raw}
    for k in range(n - 1, 0, -1):
        # continuation counts: distinct left extensions in the (k+1) table
        counts[k] = (counts[k + 1]
                     .select(F.slice("gram", 2, k).alias("gram"))
                     .groupBy("gram")
                     .agg(F.count("*").cast("double").alias("c"))
                     .localCheckpoint(eager=True))
    pmass, lam = {}, {}
    for k in range(1, n + 1):
        pmass[k], lam[k] = _level_tables(counts[k], k, float(discount))
    vocab = counts[1].count()  # collect-ok: 1-value vocab-size probe
    return {"n": n, "discount": float(discount), "V": int(vocab),
            "pmass": pmass, "lam": lam}


def kn_prob(model: dict, pairs: DataFrame, *, ctx_col: str = "ctx",
            w_col: str = "w") -> DataFrame:
    """P(w | ctx) for arbitrary (ctx array<string> of length n-1, w)
    rows: n left joins, then the interpolation folded innermost-out as
    a single column expression.  Adds column ``p``."""
    n = model["n"]
    out = pairs
    for k in range(n, 0, -1):
        ctx_k = (F.slice(F.col(ctx_col), n + 1 - k, k - 1) if k > 1
                 else F.array().cast("array<string>"))
        pm = model["pmass"][k].select(
            F.col("ctx").alias(f"_c{k}"), F.col("w").alias(f"_w{k}"),
            F.col("pmass").alias(f"_pm{k}"))
        lm = model["lam"][k].select(
            F.col("ctx").alias(f"_lc{k}"), F.col("lam").alias(f"_l{k}"))
        out = (out
               .withColumn(f"_ck{k}", ctx_k)
               .join(pm, (F.col(f"_ck{k}") == F.col(f"_c{k}"))
                     & (F.col(w_col) == F.col(f"_w{k}")), "left")
               .join(lm, F.col(f"_ck{k}") == F.col(f"_lc{k}"), "left")
               .drop(f"_c{k}", f"_w{k}", f"_lc{k}", f"_ck{k}"))
    p = F.lit(1.0 / (model["V"] + 1))
    for k in range(1, n + 1):
        p = (F.coalesce(F.col(f"_pm{k}"), F.lit(0.0))
             + F.coalesce(F.col(f"_l{k}"), F.lit(1.0)) * p)
    keep = [c for c in out.columns
            if not (c.startswith("_pm") or c.startswith("_l"))]
    return out.select(*keep, p.alias("p"))


def kn_score(docs: DataFrame, model: dict, *, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Per-document LM score: (id, n_tokens, log_prob, perplexity) —
    perplexity = exp(−log_prob / n_tokens) over the word+</s>
    prediction positions, the CCNet filtering statistic."""
    n = model["n"]
    toks = _tokens(F.col(text_col), n)
    cnt = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(1), cnt)
    grams = F.transform(idx, lambda i: F.slice(toks, i, n))
    pos = (docs
           .select(F.col(id_col).alias("_id"),
                   F.explode(grams).alias("gram"))
           .select("_id", F.slice("gram", 1, n - 1).alias("ctx"),
                   F.element_at("gram", n).alias("w")))
    scored = kn_prob(model, pos)
    return (scored.groupBy("_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum(F.log("p")).alias("log_prob"))
            .select(F.col("_id").alias(id_col), "n_tokens", "log_prob",
                    F.exp(-F.col("log_prob") / F.col("n_tokens"))
                    .alias("perplexity")))
