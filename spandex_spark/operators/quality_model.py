"""Trainable document-quality classifier — the fastText-filter shape.

Reference semantics: production corpus curation gates documents with a
LEARNED quality model (GPT-3's WebText-vs-CommonCrawl logistic
classifier; CCNet/LLaMA's fastText variants) layered over rule scores
(textstats.quality_score / gopher_rules).  This module implements that
shape self-contained: logistic regression over the engine's own
engineered text features, trained driver-side on a BOUNDED labeled
sample, scored corpus-wide in PURE CODEGEN.

Pipeline split, each half in its natural place:

* `quality_features` appends the feature columns — length,
  mean-word-length, alpha/punct/digit/upper ratios, stopword ratio —
  all whole-stage-codegen expressions (the quality_score signals,
  exposed raw);
* `train_quality_model` collects a seeded bounded sample of
  (features, label) (the langmodel.py training contract), standardizes
  features, and fits L2 logistic regression by deterministic full-batch
  gradient descent in numpy — no solver dependency, bit-reproducible;
* `apply_quality_model` scores ANY frame with
  sigmoid(w·(x - mu)/sd + b) built as a plain Column expression —
  zero Python at scoring time, the 10^12-row path.

Output probability is a real p(label=1 | features); threshold it with
corpus_select-style filters.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spandex_spark.operators.textstats import _LANG_MARKERS

__all__ = ["quality_features", "train_quality_model",
           "apply_quality_model", "FEATURES"]

FEATURES = ("f_log_chars", "f_mean_wlen", "f_alpha", "f_punct",
            "f_digit", "f_upper", "f_stop")


def _feature_exprs(text_col: str) -> dict[str, Column]:
    text = F.col(text_col)
    n_chars = F.greatest(F.length(text), F.lit(1))
    toks = F.split(F.trim(text), r"\s+")
    n_words = F.greatest(
        F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(toks)),
        F.lit(1))

    def ratio(pattern):
        return (F.length(F.regexp_replace(text, pattern, ""))
                .cast("double") / n_chars)

    n_stop = F.size(F.filter(
        toks, lambda t: F.lower(t).isin(*_LANG_MARKERS["en"])))
    return {
        "f_log_chars": F.log(n_chars.cast("double")),
        "f_mean_wlen": n_chars.cast("double") / n_words,
        "f_alpha": ratio(r"[^A-Za-z]"),
        "f_punct": ratio(r"[^.,;:!?]"),
        "f_digit": ratio(r"[^0-9]"),
        "f_upper": ratio(r"[^A-Z]"),
        "f_stop": n_stop.cast("double") / n_words,
    }


def quality_features(df: DataFrame, *,
                     text_col: str = "text") -> DataFrame:
    """Append the FEATURES columns (codegen; NULL text -> NULL
    features, which score NULL)."""
    out = df
    for name, expr in _feature_exprs(text_col).items():
        out = out.withColumn(name, expr)
    return out


def train_quality_model(labeled: DataFrame, *, label_col: str,
                        text_col: str = "text",
                        sample_rows: int = 10000, l2: float = 1e-3,
                        iters: int = 500, lr: float = 0.5,
                        seed: int = 42) -> dict:
    """Fit the classifier on a bounded seeded sample of `labeled`
    (label_col in {0, 1}).  Returns a plain-dict model:
    {"features", "mu", "sd", "w", "b"} — standardization folded in so
    `apply_quality_model` is a single dot product."""
    feats = quality_features(labeled, text_col=text_col)
    take = (feats.select(*FEATURES,
                         F.col(label_col).cast("double").alias("_y"))
            .filter(F.col("_y").isNotNull())
            .orderBy(F.xxhash64(*FEATURES, F.lit(seed)))
            .limit(sample_rows))
    rows = take.collect()  # collect-ok: bounded seeded training sample (sample_rows rows), the langmodel.py training contract
    if len(rows) < 10:
        raise ValueError("train_quality_model needs >= 10 labeled rows")
    X = np.array([[r[f] for f in FEATURES] for r in rows], np.float64)
    y = np.array([r["_y"] for r in rows], np.float64)
    mu = X.mean(0)
    sd = X.std(0)
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd
    w = np.zeros(X.shape[1])
    b = 0.0
    n = X.shape[0]
    for _ in range(iters):
        z = Xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = Xs.T @ (p - y) / n + l2 * w
        gb = float((p - y).mean())
        w -= lr * g
        b -= lr * gb
    return {"features": list(FEATURES), "mu": mu.tolist(),
            "sd": sd.tolist(), "w": w.tolist(), "b": float(b)}


def apply_quality_model(df: DataFrame, model: dict, *,
                        text_col: str = "text",
                        out_col: str = "quality_p") -> DataFrame:
    """Append p(good) under a `train_quality_model` model — one
    codegen expression, zero Python, zero shuffle."""
    exprs = _feature_exprs(text_col)
    z = F.lit(model["b"])
    for name, mu, sd, w in zip(model["features"], model["mu"],
                               model["sd"], model["w"]):
        z = z + F.lit(w) * ((exprs[name] - F.lit(mu)) / F.lit(sd))
    return df.withColumn(out_col,
                         F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
