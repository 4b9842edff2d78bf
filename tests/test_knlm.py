"""Distributed interpolated Kneser-Ney LM (operators/knlm.py): exact
sum-to-1 over the vocabulary, pure-Python reference parity on every
probability, backoff behavior for unseen contexts/words, scoring."""

import collections
import math

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.knlm import (
    BOS, EOS, kn_prob, kn_score, train_kn_lm)

DOCS = ["the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog and a cat",
        "the cat the cat the dog"]


def _ref_model(texts, n, D):
    """Mirror of the module docstring's formulas."""
    counts = {k: collections.Counter() for k in range(1, n + 1)}
    for t in texts:
        toks = [BOS] * (n - 1) + t.lower().split() + [EOS]
        for i in range(len(toks) - n + 1):
            counts[n][tuple(toks[i:i + n])] += 1
    for k in range(n - 1, 0, -1):
        for g in counts[k + 1]:
            counts[k][g[1:]] += 1  # continuation: distinct left ext
    tables = {}
    for k in range(1, n + 1):
        denom = collections.Counter()
        n1 = collections.Counter()
        for g, c in counts[k].items():
            denom[g[:-1]] += c
            n1[g[:-1]] += 1
        pmass = {g: max(c - D, 0.0) / denom[g[:-1]]
                 for g, c in counts[k].items()}
        lam = {ctx: D * n1[ctx] / denom[ctx] for ctx in denom}
        tables[k] = (pmass, lam)
    V = len(counts[1])
    return tables, V


def _ref_prob(tables, V, n, ctx, w):
    p = 1.0 / (V + 1)
    for k in range(1, n + 1):
        c = tuple(ctx[len(ctx) - (k - 1):]) if k > 1 else ()
        pmass, lam = tables[k]
        p = pmass.get(c + (w,), 0.0) + lam.get(c, 1.0) * p
    return p


@pytest.fixture(scope="module")
def model3(spark):
    df = spark.createDataFrame(list(enumerate(DOCS)),
                               "doc_id long, text string")
    return train_kn_lm(df, n=3)


def _vocab():
    words = set()
    for t in DOCS:
        words.update(t.split())
    words.add(EOS)
    return sorted(words)


def test_distribution_sums_to_one(spark, model3):
    # P(w | "the cat") summed over every seen type + one OOV == 1
    vocab = _vocab() + ["zzz_oov"]
    pairs = spark.createDataFrame(
        [(["the", "cat"], w) for w in vocab],
        "ctx array<string>, w string")
    tot = kn_prob(model3, pairs).agg(F.sum("p")).collect()[0][0]
    assert tot == pytest.approx(1.0, abs=1e-12)
    # also for an UNSEEN context (pure backoff down to unigrams)
    pairs2 = spark.createDataFrame(
        [(["purple", "unicorn"], w) for w in vocab],
        "ctx array<string>, w string")
    tot2 = kn_prob(model3, pairs2).agg(F.sum("p")).collect()[0][0]
    assert tot2 == pytest.approx(1.0, abs=1e-12)


def test_every_probability_matches_reference(spark, model3):
    tables, V = _ref_model(DOCS, 3, 0.75)
    assert model3["V"] == V
    ctxs = [["the", "cat"], ["a", "dog"], [BOS, BOS], [BOS, "the"],
            ["purple", "unicorn"], ["on", "the"]]
    vocab = _vocab() + ["zzz_oov"]
    rows = [(i, c, w) for i, c in enumerate(ctxs) for w in vocab]
    pairs = spark.createDataFrame(rows,
                                  "i long, ctx array<string>, w string")
    got = kn_prob(model3, pairs).collect()
    for r in got:
        want = _ref_prob(tables, V, 3, r["ctx"], r["w"])
        assert r["p"] == pytest.approx(want, rel=1e-12), (r["ctx"], r["w"])


def test_bigram_model_matches_reference(spark):
    df = spark.createDataFrame(list(enumerate(DOCS)),
                               "doc_id long, text string")
    m = train_kn_lm(df, n=2, discount=0.5)
    tables, V = _ref_model(DOCS, 2, 0.5)
    vocab = _vocab() + ["qqq"]
    pairs = spark.createDataFrame(
        [(["the"], w) for w in vocab] + [(["qqq"], w) for w in vocab],
        "ctx array<string>, w string")
    for r in kn_prob(m, pairs).collect():
        want = _ref_prob(tables, V, 2, r["ctx"], r["w"])
        assert r["p"] == pytest.approx(want, rel=1e-12)


def test_scoring_in_domain_beats_gibberish(spark, model3):
    probe = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "zzz qqq www yyy xxx vvv")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in kn_score(probe, model3).collect()}
    assert out[1]["perplexity"] < out[2]["perplexity"] / 5
    assert out[1]["n_tokens"] == 7  # 6 words + </s>
    # log_prob equals the sum of per-position reference probs
    tables, V = _ref_model(DOCS, 3, 0.75)
    toks = [BOS, BOS] + "the cat sat on the mat".split() + [EOS]
    want = sum(math.log(_ref_prob(tables, V, 3, toks[i:i + 2], toks[i + 2]))
               for i in range(len(toks) - 2))
    assert out[1]["log_prob"] == pytest.approx(want, rel=1e-12)


def test_empty_doc_scores_eos_only(spark, model3):
    probe = spark.createDataFrame([(1, "")], "doc_id long, text string")
    out = kn_score(probe, model3).collect()[0]
    assert out["n_tokens"] == 1
    tables, V = _ref_model(DOCS, 3, 0.75)
    assert out["log_prob"] == pytest.approx(
        math.log(_ref_prob(tables, V, 3, [BOS, BOS], EOS)), rel=1e-12)
