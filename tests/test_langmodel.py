"""Char n-gram LM scoring (operators/langmodel.py): closed-form
hand-computed bits on a periodic string, in-domain vs junk separation,
partitioning invariance, NULL/empty conventions."""

import math

import numpy as np
import pytest

from spandex_spark.operators.langmodel import (
    _score_text, lm_perplexity, train_char_lm)


def _english_rows(rng, m):
    words = ("the quick brown fox jumps over a lazy dog and runs through "
             "green fields near the quiet river bank at dawn").split()
    return [" ".join(rng.choice(words, 30)) for _ in range(m)]


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(5)
    docs = _english_rows(rng, 300)
    return spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                                 "id long, text string")


def test_closed_form_periodic_string(spark):
    df = spark.createDataFrame([(0, "ab" * 50)], "id long, text string")
    model = train_char_lm(df, n=2, sample_rows=10, add_k=0.5)
    # training alphabet {a, b}: vocab_n = 3.  Counts: 'a'->'b' 50x,
    # 'b'->'a' 49x, ' '->'a' 1x (the left pad).
    k, v = 0.5, 3
    p_b_a = (50 + k) / (50 + k * v)
    p_a_b = (49 + k) / (49 + k * v)
    p_a_pad = (1 + k) / (1 + k * v)
    want = -(math.log2(p_a_pad) + 50 * math.log2(p_b_a)
             + 49 * math.log2(p_a_b)) / 100
    got = _score_text("ab" * 50, model, 2000)
    assert got == pytest.approx(want, rel=1e-12)


def test_separates_in_domain_from_junk(spark, corpus):
    rng = np.random.default_rng(9)
    model = train_char_lm(corpus, n=3, sample_rows=200)
    alphabet = list("abcdefghijklmnopqrstuvwxyz0123456789#$%&@")
    junk = "".join(rng.choice(alphabet, 600))
    held_out = _english_rows(rng, 1)[0]
    test_df = corpus.sparkSession.createDataFrame(
        [(0, held_out), (1, junk)], "id long, text string")
    rows = {r["id"]: r for r in
            lm_perplexity(test_df, model).collect()}
    assert rows[0]["perplexity"] < 8 < rows[1]["perplexity"]
    assert rows[1]["bits_per_char"] > 2 * rows[0]["bits_per_char"]


def test_partitioning_invariance(spark, corpus):
    model = train_char_lm(corpus, n=3, sample_rows=150, seed=7)
    one = {r["id"]: r["bits_per_char"] for r in
           lm_perplexity(corpus.coalesce(1), model).collect()}
    many = {r["id"]: r["bits_per_char"] for r in
            lm_perplexity(corpus.repartition(13), model).collect()}
    assert one == many
    # retraining with the same seed is bit-identical too
    model2 = train_char_lm(corpus.repartition(17), n=3,
                           sample_rows=150, seed=7)
    again = {r["id"]: r["bits_per_char"] for r in
             lm_perplexity(corpus.coalesce(1), model2).collect()}
    assert again == one


def test_null_and_empty_text(spark, corpus):
    model = train_char_lm(corpus, n=3, sample_rows=50)
    df = spark.createDataFrame([(0, None), (1, "   "), (2, "ok")],
                               "id long, text string")
    rows = {r["id"]: r for r in lm_perplexity(df, model).collect()}
    assert rows[0]["perplexity"] is None
    assert rows[1]["perplexity"] is None      # whitespace-only = empty
    assert rows[2]["perplexity"] is not None


def test_unseen_context_falls_back_to_unigram(spark):
    df = spark.createDataFrame([(0, "aaaa bbbb")], "id long, text string")
    model = train_char_lm(df, n=4, sample_rows=5, add_k=1.0)
    # 'zzz' context unseen -> unigram; 'q' unseen everywhere -> UNK mass
    s = _score_text("zzzq", model, 2000)
    assert s is not None and s > 0
