"""Product quantization (operators/similarity.py): exactness when the
corpus IS its reconstruction, recall floor on clustered data, code
compactness, determinism, and the dim-divisibility guard."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.similarity import (ann_bruteforce, ann_pq,
                                                pq_encode,
                                                train_pq_codebooks)


def _vec_df(spark, mat, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>")


def test_exact_when_corpus_is_reconstruction(spark):
    """Vectors drawn exactly from the codebook product: ADC distance is
    the TRUE distance, so PQ top-k == brute-force euclidean top-k."""
    rng = np.random.default_rng(0)
    m, ks, dsub = 4, 8, 4
    books = rng.normal(0, 1, (m, ks, dsub))
    picks = rng.integers(0, ks, (60, m))
    corpus = np.concatenate([books[s][picks[:, s]] for s in range(m)], axis=1)
    queries = rng.normal(0, 1, (5, m * dsub))
    cdf = _vec_df(spark, corpus)
    qdf = _vec_df(spark, queries, start_id=1000)
    codes = pq_encode(cdf, books)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in ann_pq(qdf, codes, books, k=3).collect()}
    # exact reference: euclidean argsort
    d2 = ((queries[:, None, :] - corpus[None, :, :]) ** 2).sum(axis=2)
    for qi in range(5):
        order = np.lexsort((np.arange(60), d2[qi]))[:3]
        for rank, nid in enumerate(order, start=1):
            assert got[(1000 + qi, rank)] == nid


def test_recall_floor_on_clustered_data(spark):
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 10, (10, 32))
    corpus = np.concatenate(
        [c + rng.normal(0, 0.5, (40, 32)) for c in centers])
    queries = centers + rng.normal(0, 0.5, (10, 32))
    cdf = _vec_df(spark, corpus)
    qdf = _vec_df(spark, queries, start_id=5000)
    books = train_pq_codebooks(cdf, m=8, ks=64, sample_rows=1000)
    codes = pq_encode(cdf, books)
    got = ann_pq(qdf, codes, books, k=10).collect()
    # exact euclidean reference
    d2 = ((queries[:, None, :] - corpus[None, :, :]) ** 2).sum(axis=2)
    hits = total = 0
    truth = {5000 + qi: set(np.argsort(d2[qi])[:10]) for qi in range(10)}
    for r in got:
        total += 1
        hits += int(r["neighbor_id"] in truth[r["query_id"]])
    assert total == 100
    assert hits / total >= 0.6      # PQ recall floor at this operating point


def test_code_size_and_determinism(spark):
    rng = np.random.default_rng(3)
    corpus = rng.normal(0, 1, (50, 16))
    cdf = _vec_df(spark, corpus)
    books = train_pq_codebooks(cdf, m=4, ks=16, sample_rows=100)
    a = {r["vec_id"]: bytes(r["code"])
         for r in pq_encode(cdf, books).collect()}
    b = {r["vec_id"]: bytes(r["code"])
         for r in pq_encode(cdf.repartition(7), books).collect()}
    assert a == b
    assert all(len(c) == 4 for c in a.values())   # m bytes per vector
    books2 = train_pq_codebooks(cdf, m=4, ks=16, sample_rows=100)
    assert np.array_equal(books, books2)          # deterministic training


def test_dim_guard_and_ks_guard(spark):
    rng = np.random.default_rng(1)
    cdf = _vec_df(spark, rng.normal(0, 1, (20, 10)))
    with pytest.raises(ValueError):
        train_pq_codebooks(cdf, m=4, ks=8, sample_rows=100)  # 10 % 4 != 0
    with pytest.raises(ValueError):
        pq_encode(cdf, np.zeros((2, 300, 5)))                # ks > 256
