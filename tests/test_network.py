"""Network SSSP (operators/network.py): closed-form grid distances,
Dijkstra cross-check on a random graph, multi-source nearest-facility
labels, max_cost service areas, directed vs undirected."""

import heapq
import random

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.network import service_areas, shortest_paths


def _grid_edges(spark, n):
    """n x n 4-grid, unit weights, undirected edge list (one direction
    stored; tests pass directed=False)."""
    rows = []
    for r in range(n):
        for c in range(n):
            u = r * n + c
            if c + 1 < n:
                rows.append((u, u + 1, 1.0))
            if r + 1 < n:
                rows.append((u, u + n, 1.0))
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def _sources(spark, nodes):
    return spark.createDataFrame([(int(v),) for v in nodes], "node long")


def test_grid_manhattan_distances(spark):
    n = 7
    out = shortest_paths(_grid_edges(spark, n), _sources(spark, [0]),
                         directed=False)
    got = {r["node"]: r["dist"] for r in out.collect()}
    assert len(got) == n * n
    for v, d in got.items():
        assert d == float(v // n + v % n)  # manhattan from corner


def test_directed_reachability(spark):
    # chain 0->1->2 directed: from node 2 nothing else is reachable
    e = spark.createDataFrame([(0, 1, 1.0), (1, 2, 1.0)],
                              "src long, dst long, weight double")
    fwd = shortest_paths(e, _sources(spark, [0]), directed=True)
    assert {r["node"]: r["dist"] for r in fwd.collect()} == \
        {0: 0.0, 1: 1.0, 2: 2.0}
    back = shortest_paths(e, _sources(spark, [2]), directed=True)
    assert {r["node"] for r in back.collect()} == {2}


def _dijkstra(adj, srcs):
    dist = {s: (0.0, s) for s in srcs}
    pq = [(0.0, s, s) for s in srcs]
    heapq.heapify(pq)
    while pq:
        d, o, u = heapq.heappop(pq)
        if (d, o) > dist.get(u, (float("inf"), None)):
            continue
        for v, w in adj.get(u, ()):
            nd = (d + w, o)
            if nd < dist.get(v, (float("inf"), None)):
                dist[v] = nd
                heapq.heappush(pq, (nd[0], o, v))
    return dist


def test_random_graph_matches_dijkstra(spark):
    rng = random.Random(7)
    edges = set()
    while len(edges) < 300:
        u, v = rng.randrange(60), rng.randrange(60)
        if u != v:
            edges.add((u, v))
    rows = [(u, v, round(rng.uniform(0.5, 5.0), 3)) for u, v in edges]
    adj = {}
    for u, v, w in rows:
        adj.setdefault(u, []).append((v, w))
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    srcs = [0, 17, 42]
    out = shortest_paths(e, _sources(spark, srcs))
    got = {r["node"]: (r["dist"], r["origin"]) for r in out.collect()}
    want = _dijkstra(adj, srcs)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-9), v
        assert got[v][1] == want[v][1], v  # same deterministic origin


def test_multi_source_nearest_facility(spark):
    n = 6
    out = shortest_paths(_grid_edges(spark, n),
                         _sources(spark, [0, n * n - 1]),
                         directed=False)
    got = {r["node"]: r for r in out.collect()}
    # corner 0 labels its own corner; opposite corner labels the other
    assert got[0]["origin"] == 0 and got[n * n - 1]["origin"] == n * n - 1
    # every node is labeled by whichever corner is manhattan-nearer
    for v, r in got.items():
        d0 = v // n + v % n
        d1 = (n - 1 - v // n) + (n - 1 - v % n)
        assert r["dist"] == float(min(d0, d1))
        if d0 != d1:
            assert r["origin"] == (0 if d0 < d1 else n * n - 1)
        else:
            assert r["origin"] == 0  # tie breaks to the smaller origin


def test_service_area_budget(spark):
    n = 7
    out = service_areas(_grid_edges(spark, n), _sources(spark, [0]),
                        max_cost=3.0, directed=False)
    got = {r["node"]: r["dist"] for r in out.collect()}
    for v in range(n * n):
        d = v // n + v % n
        assert (v in got) == (d <= 3), v
    assert max(got.values()) == 3.0


def test_max_rounds_guard(spark):
    e = spark.createDataFrame([(i, i + 1, 1.0) for i in range(20)],
                              "src long, dst long, weight double")
    with pytest.raises(RuntimeError, match="did not converge"):
        shortest_paths(e, _sources(spark, [0]), max_rounds=5)


def test_parent_pointers_form_consistent_sp_forest(spark):
    rng = random.Random(11)
    edges = set()
    while len(edges) < 200:
        u, v = rng.randrange(40), rng.randrange(40)
        if u != v:
            edges.add((u, v))
    rows = [(u, v, round(rng.uniform(0.5, 4.0), 3)) for u, v in edges]
    w = {(u, v): wt for u, v, wt in rows}
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    out = {r["node"]: r for r in
           shortest_paths(e, _sources(spark, [0, 5])).collect()}
    for v, r in out.items():
        if r["dist"] == 0.0:
            assert r["parent"] is None and r["origin"] == v
            continue
        p = r["parent"]
        assert p in out, (v, p)
        # the tree edge exists and is tight: dist = dist(parent) + w
        assert (p, v) in w
        assert r["dist"] == pytest.approx(out[p]["dist"] + w[(p, v)],
                                          abs=1e-9)
        assert r["origin"] == out[p]["origin"]  # same tree


def test_equal_dist_relabel_propagates(spark):
    # review regression: tie at X resolves to origin A via P, and the
    # relabel must PROPAGATE to downstream C even though X's dist
    # never improved after its first label
    e = spark.createDataFrame(
        [(0, 10, 3.0), (10, 20, 2.0), (5, 20, 5.0), (20, 30, 1.0)],
        "src long, dst long, weight double")  # A=0, P=10, X=20, B=5, C=30
    out = {r["node"]: r for r in
           shortest_paths(e, _sources(spark, [0, 5])).collect()}
    assert out[20]["dist"] == 5.0
    assert out[20]["origin"] == 0 and out[20]["parent"] == 10
    assert out[30]["origin"] == 0 and out[30]["parent"] == 20
