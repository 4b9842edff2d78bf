"""ST_ClusterKMeans analog (operators/cluster.py::cluster_kmeans):
well-separated blob recovery, partitioning determinism, the n<=k
distinct-position rule, the converged nearest-centroid invariant, and
per-group independence."""

import numpy as np
import pytest

from spandex_spark.operators.cluster import cluster_kmeans


def _df(spark, pts, groups=None):
    groups = groups or [0] * len(pts)
    return spark.createDataFrame(
        [(g, i, float(x), float(y))
         for i, (g, (x, y)) in enumerate(zip(groups, pts))],
        "grp long, pid long, lon double, lat double")


def _blobs(rng, centers, n_each, spread=0.1):
    pts, truth = [], []
    for ci, (cx, cy) in enumerate(centers):
        for _ in range(n_each):
            pts.append((cx + rng.normal(0, spread),
                        cy + rng.normal(0, spread)))
            truth.append(ci)
    return pts, truth


def test_recovers_separated_blobs(spark):
    rng = np.random.default_rng(1)
    pts, truth = _blobs(rng, [(0, 0), (10, 0), (0, 10)], 30)
    got = {r["pid"]: r["cluster_id"] for r in
           cluster_kmeans(_df(spark, pts), k=3, group_col="grp",
                          point_id_col="pid").collect()}
    # same blob -> same label, different blob -> different label
    lab_of_blob = {}
    for i, t in enumerate(truth):
        lab_of_blob.setdefault(t, set()).add(got[i])
    labs = [lab_of_blob[t] for t in range(3)]
    assert all(len(s) == 1 for s in labs)
    assert len(set().union(*labs)) == 3


def test_partitioning_independent(spark):
    rng = np.random.default_rng(2)
    pts, _ = _blobs(rng, [(0, 0), (5, 5)], 20)
    df = _df(spark, pts)
    a = {r["pid"]: r["cluster_id"] for r in
         cluster_kmeans(df, k=2, group_col="grp",
                        point_id_col="pid").collect()}
    b = {r["pid"]: r["cluster_id"] for r in
         cluster_kmeans(df.repartition(13), k=2, group_col="grp",
                        point_id_col="pid").collect()}
    assert a == b


def test_n_at_most_k_distinct_positions(spark):
    pts = [(0.0, 0.0), (0.0, 0.0), (1.0, 1.0), (2.0, 2.0)]
    got = {r["pid"]: r["cluster_id"] for r in
           cluster_kmeans(_df(spark, pts), k=5, group_col="grp",
                          point_id_col="pid").collect()}
    assert got[0] == got[1]                      # same position
    assert len({got[0], got[2], got[3]}) == 3    # distinct positions split


def test_converged_points_nearest_centroid(spark):
    rng = np.random.default_rng(3)
    pts = [tuple(p) for p in rng.uniform(0, 10, (60, 2))]
    rows = cluster_kmeans(_df(spark, pts), k=4, group_col="grp",
                          point_id_col="pid").collect()
    lab = np.array([r["cluster_id"] for r in sorted(rows,
                    key=lambda r: r["pid"])])
    X = np.array(pts)
    C = np.stack([X[lab == c].mean(axis=0) for c in range(4)])
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assert np.array_equal(d.argmin(axis=1), lab)   # Lloyd fixed point


def test_groups_independent_and_k1(spark):
    pts = [(0.0, 0.0), (9.0, 9.0), (0.0, 0.0), (9.0, 9.0)]
    got = cluster_kmeans(_df(spark, pts, groups=[0, 0, 1, 1]), k=1,
                         group_col="grp", point_id_col="pid").collect()
    assert all(r["cluster_id"] == 0 for r in got)
    assert {(r["grp"]) for r in got} == {0, 1}
    with pytest.raises(ValueError):
        cluster_kmeans(_df(spark, pts), k=0, group_col="grp",
                       point_id_col="pid")
