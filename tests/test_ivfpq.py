"""IVFPQ / IVFADC (operators/similarity.py): full-probe + zero-residual
exactness vs brute-force euclidean, recall floor on clustered data,
nprobe monotonicity, cell-pushdown, determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.similarity import (ann_ivfpq, ivfpq_encode,
                                                train_ivfpq)


def _vec_df(spark, mat, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>")


def test_exact_when_residuals_are_codewords(spark):
    """Corpus = centroid + exact residual codeword: ADC is the true
    distance; probing ALL cells makes IVFPQ == brute force."""
    rng = np.random.default_rng(0)
    n_c, m, ks, dsub = 4, 4, 8, 4
    coarse = rng.normal(0, 20, (n_c, m * dsub))
    books = rng.normal(0, 1, (m, ks, dsub))
    cells = rng.integers(0, n_c, 80)
    picks = rng.integers(0, ks, (80, m))
    resid = np.concatenate([books[s][picks[:, s]] for s in range(m)], axis=1)
    corpus = coarse[cells] + resid
    queries = rng.normal(0, 20, (6, m * dsub))
    enc = ivfpq_encode(_vec_df(spark, corpus), coarse, books)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in ann_ivfpq(_vec_df(spark, queries, 1000), enc,
                              coarse, books, k=3, nprobe=n_c).collect()}
    d2 = ((queries[:, None, :] - corpus[None, :, :]) ** 2).sum(axis=2)
    for qi in range(6):
        order = np.lexsort((np.arange(80), d2[qi]))[:3]
        for rank, nid in enumerate(order, 1):
            assert got[(1000 + qi, rank)] == nid


def test_recall_floor_and_nprobe_monotone(spark):
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 10, (12, 32))
    corpus = np.concatenate(
        [c + rng.normal(0, 0.4, (50, 32)) for c in centers])
    queries = centers[:8] + rng.normal(0, 0.4, (8, 32))
    cdf = _vec_df(spark, corpus)
    coarse, books = train_ivfpq(cdf, n_centroids=12, m=8, ks=64,
                                sample_rows=2000)
    enc = ivfpq_encode(cdf, coarse, books).cache()
    d2 = ((queries[:, None, :] - corpus[None, :, :]) ** 2).sum(axis=2)
    truth = {5000 + qi: set(np.argsort(d2[qi])[:10]) for qi in range(8)}
    qdf = _vec_df(spark, queries, 5000)

    def recall(nprobe):
        rows = ann_ivfpq(qdf, enc, coarse, books, k=10,
                         nprobe=nprobe).collect()
        return sum(r["neighbor_id"] in truth[r["query_id"]]
                   for r in rows) / max(len(rows), 1)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1 - 1e-9          # more probes never hurt
    assert r4 >= 0.6                # clustered-data floor


def test_cell_pushdown_prunes_scan(spark):
    rng = np.random.default_rng(3)
    corpus = rng.normal(0, 5, (100, 16))
    cdf = _vec_df(spark, corpus)
    coarse, books = train_ivfpq(cdf, n_centroids=10, m=4, ks=16,
                                sample_rows=500)
    enc = ivfpq_encode(cdf, coarse, books)
    q = _vec_df(spark, corpus[:1], 9000)
    out = ann_ivfpq(q, enc, coarse, books, k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "cell#" in plan and ("IN (" in plan or "isin" in plan.lower()
                                or " IN " in plan)
    assert out.count() == 3


def test_deterministic(spark):
    rng = np.random.default_rng(5)
    corpus = rng.normal(0, 5, (60, 16))
    cdf = _vec_df(spark, corpus)
    a_c, a_b = train_ivfpq(cdf, n_centroids=6, m=4, ks=16, sample_rows=500)
    b_c, b_b = train_ivfpq(cdf, n_centroids=6, m=4, ks=16, sample_rows=500)
    assert np.array_equal(a_c, b_c) and np.array_equal(a_b, b_b)
    enc = ivfpq_encode(cdf, a_c, a_b)
    q = _vec_df(spark, corpus[:3], 7000)
    x = sorted(map(tuple, ann_ivfpq(q, enc, a_c, a_b, k=5,
                                    nprobe=3).collect()))
    y = sorted(map(tuple, ann_ivfpq(q, ivfpq_encode(cdf.repartition(7),
                                                    a_c, a_b),
                                    a_c, a_b, k=5, nprobe=3).collect()))
    assert x == y


def test_dim_guard(spark):
    rng = np.random.default_rng(1)
    cdf = _vec_df(spark, rng.normal(0, 1, (20, 10)))
    with pytest.raises(ValueError):
        train_ivfpq(cdf, n_centroids=4, m=4, ks=8, sample_rows=100)
