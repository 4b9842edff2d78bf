"""Character n-gram language-model quality scoring — the CCNet axis.

Reference semantics: CCNet (Wenzek et al. 2020) ranks Common-Crawl
documents by language-model perplexity and keeps the low-perplexity
head — the third quality axis next to rule-based scores
(textstats.quality_score / gopher_rules) and dedup (dedup.py).  CCNet
uses a KenLM 5-gram over SentencePiece tokens; this engine implements
the same *shape* — train a small smoothed n-gram LM on an in-domain
sample, score every document, filter on perplexity — over CHARACTERS,
which needs no external model artifact and keeps the whole pipeline
self-contained and deterministic.

Spark realization:

* `train_char_lm` draws a BOUNDED, seeded sample (the
  similarity.py::train_ivf_centroids contract: sample size is the
  knob, never the corpus), counts (n-1)-gram -> char transitions
  driver-side, and returns a plain-dict model with add-k smoothing
  and a unigram backoff for unseen contexts;
* `lm_perplexity` broadcasts the model inside an Arrow-batched
  mapInPandas closure (UDFs are the documented slow path; there is no
  JVM expression for "dict lookup per character", and the model dict
  is a few MB — well under broadcast budget at any corpus size).
  Output adds `bits_per_char` (mean -log2 p) and `perplexity`
  (2^bpc).  Empty/NULL texts score NULL.

Determinism: text normalizes to NFC-free lowercase with collapsed
whitespace (the textstats convention), smoothing is closed-form, and
the sample is seed-pinned — same corpus, same seed => bit-identical
scores on any partitioning (pytested).

Scale shape: training is one bounded sample collect; scoring is
map-only (zero shuffle) and streams Arrow batches.  100 TB scoring is
embarrassingly parallel; the model rides task broadcast.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

__all__ = ["train_char_lm", "lm_perplexity"]

_WS = re.compile(r"\s+")


def _normalize(text: str, max_chars: int) -> str:
    return _WS.sub(" ", text.lower()).strip()[:max_chars]


def train_char_lm(corpus: DataFrame, *, text_col: str = "text", n: int = 3,
                  sample_rows: int = 2000, max_chars: int = 2000,
                  add_k: float = 0.1, seed: int = 42) -> dict:
    """Train an order-`n` character LM from a bounded seeded sample.

    Returns a plain-dict model (pickleable, a closure broadcast):
    {"n", "k", "vocab_n", "contexts": {ctx: ({char: count}, total)},
     "uni": ({char: count}, total)}.  Probabilities are materialized
    lazily at scoring time from counts via add-k smoothing:
    p(c|ctx) = (count + k) / (total + k * vocab_n), vocab_n counting
    the training alphabet plus one UNK slot.
    """
    if n < 2:
        raise ValueError("n must be >= 2 (order-1 is just `uni`)")
    take = (corpus.select(F.col(text_col).alias("t"))
            .filter(F.col("t").isNotNull())
            .orderBy(F.xxhash64(F.col("t"), F.lit(seed)))
            .limit(sample_rows))
    texts = [_normalize(r["t"], max_chars)
             for r in take.collect()]  # collect-ok: bounded seeded sample (sample_rows x max_chars), the similarity.py training contract
    ctxs: dict = {}
    uni: dict = {}
    for t in texts:
        pad = " " * (n - 1) + t
        for i in range(len(t)):
            ctx = pad[i:i + n - 1]
            ch = pad[i + n - 1]
            bucket = ctxs.setdefault(ctx, {})
            bucket[ch] = bucket.get(ch, 0) + 1
            uni[ch] = uni.get(ch, 0) + 1
    vocab_n = len(uni) + 1                      # + UNK
    return {"n": n, "k": float(add_k), "vocab_n": vocab_n,
            "contexts": {c: (d, sum(d.values())) for c, d in ctxs.items()},
            "uni": (uni, sum(uni.values()))}


def _score_text(t: str, model: dict, max_chars: int) -> float | None:
    """Mean -log2 p(char | context) under the model; None for empty."""
    n, k, v = model["n"], model["k"], model["vocab_n"]
    ctxs, (ud, ut) = model["contexts"], model["uni"]
    t = _normalize(t, max_chars)
    if not t:
        return None
    pad = " " * (n - 1) + t
    bits = 0.0
    for i in range(len(t)):
        entry = ctxs.get(pad[i:i + n - 1])
        if entry is None:
            cnt, tot = ud.get(pad[i + n - 1], 0), ut   # unigram backoff
        else:
            d, tot = entry
            cnt = d.get(pad[i + n - 1], 0)
        bits -= math.log2((cnt + k) / (tot + k * v))
    return bits / len(t)


def lm_perplexity(df: DataFrame, model: dict, *, text_col: str = "text",
                  max_chars: int = 2000) -> DataFrame:
    """Append `bits_per_char` and `perplexity` (2^bpc) columns scored
    under a `train_char_lm` model.  Map-only; NULL text -> NULL score."""
    fields = df.schema.fields + [StructField("bits_per_char", DoubleType()),
                                 StructField("perplexity", DoubleType())]
    schema = StructType(fields)

    def score(batches):
        for pdf in batches:
            bpc = [None if t is None else _score_text(t, model, max_chars)
                   for t in pdf[text_col]]
            out = pdf.copy()
            out["bits_per_char"] = pd.array(bpc, dtype="float64")
            out["perplexity"] = pd.array(
                [None if b is None else 2.0 ** b for b in bpc],
                dtype="float64")
            yield out

    return df.mapInPandas(score, schema=schema)


def perplexity_buckets(df: DataFrame, *, ppl_col: str = "perplexity",
                       lang_col: str = "lang",
                       cuts: tuple = (1.0 / 3.0, 2.0 / 3.0),
                       labels: tuple = ("head", "middle", "tail"),
                       out_col: str = "ppl_bucket") -> DataFrame:
    """CCNet's head/middle/tail artifact (Wenzek et al. 2020 §4.3):
    per-LANGUAGE perplexity buckets — the cleanest (lowest-perplexity)
    third of each language is the "head" that LM pretraining keeps
    first.  Exact per-language percent_rank window over the non-null
    scores (CCNet derives cutoffs from a sample; exact ranks are the
    deterministic equivalent at any scale and SQL-oracle-able).  NULL
    scores get a NULL bucket and do not disturb the quantiles.  One
    window shuffle on lang_col."""
    if len(labels) != len(cuts) + 1:
        raise ValueError("need exactly one more label than cuts")
    from pyspark.sql import Window
    scored = df.filter(F.col(ppl_col).isNotNull())
    w = Window.partitionBy(lang_col).orderBy(ppl_col)
    pr = F.percent_rank().over(w)
    bucket = F.lit(labels[-1])
    for c, lab in zip(reversed(cuts), reversed(labels[:-1])):
        bucket = F.when(pr < float(c), F.lit(lab)).otherwise(bucket)
    nulls = (df.filter(F.col(ppl_col).isNull())
             .withColumn(out_col, F.lit(None).cast("string")))
    return scored.withColumn(out_col, bucket).unionByName(nulls)
