"""DSIR importance resampling (operators/dsir.py): pure-Python
(hashlib) parity for the hashed n-gram weights, directional selection
closed form, NULL/empty contracts, gram counting, and seeded
Gumbel-top-k determinism."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.dsir import dsir_weights, dsir_sample


def _py_bucket(gram, buckets, seed=42):
    h = hashlib.md5(f"{seed}|{gram}".encode()).hexdigest()
    return int(h[:8], 16) % buckets


def _py_grams(text, ngram):
    toks = [t for t in "".join(
        c if c.isalnum() else " " for c in text.lower()).split() if t]
    out = []
    for k in range(1, ngram + 1):
        out += [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return out


def _py_weights(raw, target, ngram, buckets, alpha=1.0, seed=42):
    from collections import Counter
    tc, rc = Counter(), Counter()
    for t in target:
        tc.update(_py_bucket(g, buckets, seed) for g in _py_grams(t, ngram))
    for _i, t in raw:
        rc.update(_py_bucket(g, buckets, seed) for g in _py_grams(t, ngram))
    T, R = sum(tc.values()), sum(rc.values())
    lam = {b: (math.log((tc.get(b, 0) + alpha) / (T + alpha * buckets))
               - math.log((rc.get(b, 0) + alpha) / (R + alpha * buckets)))
           for b in set(tc) | set(rc)}
    out = {}
    for i, t in raw:
        gs = [_py_bucket(g, buckets, seed) for g in _py_grams(t, ngram)]
        out[i] = sum(lam.get(b, math.log((alpha / (T + alpha * buckets))
                                         / (alpha / (R + alpha * buckets))))
                     for b in gs) if gs else None
    return out


RAW = [(0, "the cat sat on the mat"),
       (1, "dogs bark at the moon all night"),
       (2, "cat cat cat purring cat"),
       (3, "stock market prices fell sharply today"),
       (4, "the cat and the dog"),
       (5, "")]
TARGET = ["a cat is a small feline",
          "the cat purred on the mat",
          "every cat chases the mouse"]


def _frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame([(t,) for t in TARGET], "text string")
    return raw, tgt


def test_weights_pure_python_parity(spark):
    raw, tgt = _frames(spark)
    got = {r.doc_id: r.log_weight
           for r in dsir_weights(raw, tgt, ngram=2, buckets=50).collect()}
    exp = _py_weights(RAW, TARGET, ngram=2, buckets=50)
    assert set(got) == set(exp)
    for i in exp:
        if exp[i] is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(exp[i], abs=1e-9)


def test_catlike_docs_rank_above_offtopic(spark):
    raw, tgt = _frames(spark)
    got = {r.doc_id: r.log_weight
           for r in dsir_weights(raw, tgt, ngram=1,
                                 buckets=1000).collect()}
    pergram = {i: got[i] / len(_py_grams(dict(RAW)[i], 1))
               for i in (0, 2, 3)}
    # cat sentences beat the stock-market doc per gram
    assert pergram[0] > pergram[3]
    assert pergram[2] > pergram[3]


def test_empty_and_null_text(spark):
    raw = spark.createDataFrame([(0, "cat"), (1, ""), (2, None)],
                                "doc_id long, text string")
    tgt = spark.createDataFrame([("cat",)], "text string")
    got = {r.doc_id: (r.log_weight, r.n_grams)
           for r in dsir_weights(raw, tgt, ngram=2, buckets=10).collect()}
    assert got[0][0] is not None and got[0][1] == 1
    assert got[1] == (None, None) and got[2] == (None, None)


def test_n_grams_count(spark):
    raw = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    tgt = spark.createDataFrame([("a",)], "text string")
    r = dsir_weights(raw, tgt, ngram=2, buckets=10).collect()[0]
    assert r.n_grams == 4 + 3


def test_sample_head_and_gumbel(spark):
    raw, tgt = _frames(spark)
    w = dsir_weights(raw, tgt, ngram=1, buckets=1000)
    top = dsir_sample(w, n=2, noisy=False)
    ids = [r.doc_id for r in top.collect()]
    assert len(ids) == 2
    lw = {r.doc_id: r.log_weight for r in w.collect()
          if r.log_weight is not None}
    assert sorted(lw[i] for i in ids) == sorted(sorted(
        lw.values(), reverse=True)[:2])
    a = sorted(r.doc_id for r in dsir_sample(w, n=3, seed=1).collect())
    b = sorted(r.doc_id for r in dsir_sample(w, n=3, seed=1).collect())
    assert a == b and len(a) == 3          # seeded determinism
    assert 5 not in a                      # NULL weight never selected


def test_validation(spark):
    raw, tgt = _frames(spark)
    with pytest.raises(ValueError):
        dsir_weights(raw, tgt, ngram=0)
    with pytest.raises(ValueError):
        dsir_weights(raw, tgt, buckets=1)
    with pytest.raises(ValueError):
        dsir_sample(dsir_weights(raw, tgt), n=0)
