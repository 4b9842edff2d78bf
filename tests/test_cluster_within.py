"""ST_ClusterWithin analog (operators/cluster.py::cluster_within):
single-linkage chains, singletons, metric/radius semantics, brute-force
parity on random points."""

import numpy as np
from pyspark.sql import functions as F

from spandex_spark.operators.cluster import cluster_within


def _pts(spark, coords):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(coords)],
        "pid long, lon double, lat double")


def test_chain_links_into_one_cluster(spark):
    # chain of points 0.9 apart: single linkage joins the whole chain
    coords = [(0.0, 0.0), (0.9, 0.0), (1.8, 0.0), (2.7, 0.0),
              (10.0, 10.0)]  # far singleton
    out = {r["pid"]: r["cluster_id"] for r in
           cluster_within(_pts(spark, coords), radius=1.0,
                          point_id_col="pid", metric="planar").collect()}
    assert out[0] == out[1] == out[2] == out[3] == 0
    assert out[4] == 4  # singleton labels itself


def test_radius_breaks_chain(spark):
    coords = [(0.0, 0.0), (0.9, 0.0), (3.0, 0.0), (3.9, 0.0)]
    out = {r["pid"]: r["cluster_id"] for r in
           cluster_within(_pts(spark, coords), radius=1.0,
                          point_id_col="pid", metric="planar").collect()}
    assert out[0] == out[1] == 0
    assert out[2] == out[3] == 2
    assert out[0] != out[2]


def test_bruteforce_parity_random(spark):
    rng = np.random.default_rng(11)
    xy = rng.uniform(-3, 3, size=(120, 2))
    r = 0.45
    # brute-force single-linkage via union-find
    parent = list(range(len(xy)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(xy)):
        for j in range(i + 1, len(xy)):
            if np.hypot(*(xy[i] - xy[j])) <= r:
                pi, pj = find(i), find(j)
                if pi != pj:
                    parent[max(pi, pj)] = min(pi, pj)
    want = {}
    for i in range(len(xy)):
        want.setdefault(find(i), []).append(i)
    want_sets = sorted(sorted(v) for v in want.values())

    out = cluster_within(_pts(spark, xy.tolist()), radius=r,
                         point_id_col="pid", metric="planar").collect()
    got = {}
    for row in out:
        got.setdefault(row["cluster_id"], []).append(row["pid"])
    got_sets = sorted(sorted(v) for v in got.values())
    assert got_sets == want_sets
    # canonical label = min member id
    for cid, members in got.items():
        assert cid == min(members)


def test_haversine_meters(spark):
    # 0.5 deg of longitude at the equator ≈ 55.66 km great-circle
    coords = [(0.0, 0.0), (0.5, 0.0)]
    out = {r["pid"]: r["cluster_id"] for r in
           cluster_within(_pts(spark, coords), radius=56_000.0,
                          point_id_col="pid").collect()}
    assert out[0] == out[1]  # 56 km > 55.66 km: linked
    out2 = {r["pid"]: r["cluster_id"] for r in
            cluster_within(_pts(spark, coords), radius=55_000.0,
                           point_id_col="pid").collect()}
    assert out2[0] != out2[1]  # 55 km < 55.66 km: separate
