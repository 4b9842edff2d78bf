"""Bitext margin mining (operators/bitext.py::mine_bitext): numpy
parity of the ratio margin, the planted-hub demotion closed form the
margin criterion exists for, intersection-vs-forward containment,
threshold filtering, and validation."""

import numpy as np
import pytest

from spandex_spark.operators.bitext import mine_bitext


def _vecs(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>")


def _np_margin(S, T, k):
    def cos(A, B):
        An = A / np.linalg.norm(A, axis=1, keepdims=True)
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        return An @ Bn.T
    C = cos(S, T)
    af = np.sort(C, axis=1)[:, -k:].mean(axis=1)
    ab = np.sort(C.T, axis=1)[:, -k:].mean(axis=1)
    return C / ((af[:, None] + ab[None, :]) / 2)


def test_forward_matches_numpy_margin(spark):
    rng = np.random.default_rng(7)
    S = rng.normal(size=(6, 8))
    T = np.vstack([S + 0.05 * rng.normal(size=S.shape),
                   rng.normal(size=(4, 8))])   # 6 true pairs + 4 noise
    k = 3
    M = _np_margin(S, T, k)
    got = {r[0]: (r[1], r.margin) for r in
           mine_bitext(_vecs(spark, S), _vecs(spark, T), k=k).collect()}
    assert set(got) == set(range(6))
    for s in range(6):
        t_star = int(np.argmax(M[s]))
        assert got[s][0] == t_star == s      # true pair wins
        assert got[s][1] == pytest.approx(M[s, t_star], abs=1e-9)


def test_hub_demotion(spark):
    # noisy true pairs plus a CENTROID hub target (close to every
    # source — the classic hubness failure).  Seed 29 is pinned so the
    # hub provably WINS raw cosine for source 0 but LOSES on margin
    # (both facts asserted below, not assumed).
    rng = np.random.default_rng(29)
    S = rng.normal(size=(6, 8))
    T = np.vstack([S + 0.45 * rng.normal(size=S.shape),
                   (S.mean(axis=0) * 2)[None, :]])
    hub = 6
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    C = Sn @ Tn.T
    M = _np_margin(S, T, 3)
    assert int(np.argmax(C[0])) == hub           # cosine picks the hub
    assert int(np.argmax(M[0])) == 0             # margin picks the true pair
    got = {r[0]: r[1] for r in
           mine_bitext(_vecs(spark, S), _vecs(spark, T), k=3).collect()}
    assert got[0] == 0
    assert all(got[s] == s for s in range(6))


def test_intersection_subset_of_forward(spark):
    rng = np.random.default_rng(3)
    S = rng.normal(size=(8, 6))
    T = rng.normal(size=(10, 6))
    f = {(r[0], r[1]) for r in
         mine_bitext(_vecs(spark, S), _vecs(spark, T), k=3,
                     strategy="forward").collect()}
    i = {(r[0], r[1]) for r in
         mine_bitext(_vecs(spark, S), _vecs(spark, T), k=3,
                     strategy="intersection").collect()}
    assert i <= f
    # intersection pairs are mutual best: each _t appears once
    assert len({t for _, t in i}) == len(i)


def test_threshold_filters_on_margin(spark):
    rng = np.random.default_rng(5)
    S = rng.normal(size=(5, 6))
    T = np.vstack([S + 0.02 * rng.normal(size=S.shape)])
    rows = mine_bitext(_vecs(spark, S), _vecs(spark, T), k=2,
                       threshold=1.05).collect()
    assert all(r.margin >= 1.05 for r in rows)
    n_all = len(mine_bitext(_vecs(spark, S), _vecs(spark, T),
                            k=2).collect())
    assert len(rows) <= n_all


def test_validation(spark):
    S = np.eye(2)
    with pytest.raises(ValueError):
        mine_bitext(_vecs(spark, S), _vecs(spark, S), strategy="nope")
    with pytest.raises(ValueError):
        mine_bitext(_vecs(spark, S), _vecs(spark, S), k=0)
