"""Anchor-text extraction/aggregation and HITS
(operators/linkgraph.py::extract_anchors/anchor_stats/hits): HTML
closed forms (tag-stripped inner text, empty image anchors, fragment
stripping), hot-key-safe top-k tie breaks, and numpy power-iteration
parity with the exact same normalization schedule."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.linkgraph import (extract_anchors,
                                               anchor_stats, hits)


def test_extract_anchors_closed_form(spark):
    pages = spark.createDataFrame([
        ("http://a.com/p1",
         '<a HREF="https://b.com/x#frag">Click <b>here</b>!</a> '
         "<a href='http://c.com/y'>\n  spaced   text </a> "
         '<a href="/relative/skip">rel</a> '
         '<a href="http://d.com/img"><img src="i.png"/></a>'),
    ], "url string, html string")
    got = {(r.dst_url, r.anchor) for r in extract_anchors(pages).collect()}
    assert got == {
        ("https://b.com/x", "Click here !"),   # fragment off, tags stripped
        ("http://c.com/y", "spaced text"),     # whitespace collapsed
        ("http://d.com/img", ""),              # image anchor kept, empty text
    }


def test_extract_anchors_binary_and_null(spark):
    pages = spark.createDataFrame(
        [("http://a.com/", bytearray(b'<a href="http://b.com/">x</a>')),
         ("http://n.com/", None)],
        "url string, html binary")
    rows = extract_anchors(pages).collect()
    assert [(r.dst_url, r.anchor) for r in rows] == [("http://b.com/", "x")]


def test_anchor_stats_topk_and_tiebreak(spark):
    rows = ([("http://s%d.com/p" % i, "http://t.com/", "beta") for i in range(3)]
            + [("http://s0.com/q", "http://t.com/", "alpha"),
               ("http://s1.com/q", "http://t.com/", "alpha"),
               ("http://s0.com/r", "http://t.com/", "gamma"),
               ("http://s9.com/", "http://t.com/", ""),
               ("http://s0.com/", "http://u.com/", "only")])
    anchors = spark.createDataFrame(
        rows, "src_url string, dst_url string, anchor string")
    got = {r.dst_url: r for r in anchor_stats(anchors, k=2).collect()}
    t = got["http://t.com/"]
    assert t.n_refs == 7                       # empty anchor still a ref
    assert t.n_src_hosts == 4                  # s0, s1, s2, s9
    assert t.top_anchors == ["beta", "alpha"]  # 3 > 2; gamma cut at k=2
    u = got["http://u.com/"]
    assert u.n_refs == 1 and u.top_anchors == ["only"]


def test_anchor_stats_all_empty_anchors(spark):
    anchors = spark.createDataFrame(
        [("http://s.com/", "http://t.com/", "")],
        "src_url string, dst_url string, anchor string")
    r = anchor_stats(anchors, k=3).collect()[0]
    assert r.n_refs == 1 and r.top_anchors == []


def _hits_numpy(edges, nodes, iters):
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
    hub = np.ones(len(nodes))
    auth = np.ones(len(nodes))
    for _ in range(iters):
        auth = A.T @ hub
        auth = auth / (np.linalg.norm(auth) or 1.0)
        hub = A @ auth
        hub = hub / (np.linalg.norm(hub) or 1.0)
    return hub, auth, idx


def test_hits_numpy_parity(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "c"),
             ("c", "e"), ("d", "e"), ("e", "a")]
    nodes = sorted({x for p in edges for x in p})
    hub, auth, idx = _hits_numpy(edges, nodes, iters=15)
    got = {r.node: (r.hub, r.auth) for r in
           hits(spark.createDataFrame(edges, "src string, dst string"),
                iters=15).collect()}
    assert set(got) == set(nodes)
    for n in nodes:
        assert abs(got[n][0] - hub[idx[n]]) < 1e-9
        assert abs(got[n][1] - auth[idx[n]]) < 1e-9


def test_hits_hub_authority_split(spark):
    # pure hub "h" points at pure authorities; roles must not bleed
    edges = [("h", "x"), ("h", "y"), ("h", "z")]
    got = {r.node: r for r in
           hits(spark.createDataFrame(edges, "src string, dst string"),
                iters=5).collect()}
    assert abs(got["h"].hub - 1.0) < 1e-12 and got["h"].auth == 0.0
    for n in "xyz":
        assert got[n].hub == 0.0
        assert abs(got[n].auth - 1 / np.sqrt(3)) < 1e-12


def test_extract_anchors_no_python_in_plan(spark):
    pages = spark.createDataFrame(
        [("http://a.com/", "<a href='http://b.com/'>x</a>")],
        "url string, html string")
    plan = (extract_anchors(pages)
            ._jdf.queryExecution().executedPlan().toString())
    for op in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert op not in plan


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _pr_numpy(edges, nodes, d, iters, t=None):
    import numpy as np
    idx = {x: i for i, x in enumerate(nodes)}
    n = len(nodes)
    tv = np.full(n, 1.0 / n)
    if t is not None:
        tv = np.zeros(n)
        for k, v in t.items():
            tv[idx[k]] = v
        tv = tv / tv.sum()
    out = {}
    for s, dd in edges:
        out.setdefault(s, []).append(dd)
    r = tv.copy()
    for _ in range(iters):
        nr = np.zeros(n)
        dangling = 0.0
        for x in nodes:
            if x in out:
                for y in out[x]:
                    nr[idx[y]] += r[idx[x]] / len(out[x])
            else:
                dangling += r[idx[x]]
        r = tv * (1 - d + d * dangling) + d * nr
    return {x: r[idx[x]] for x in nodes}


def test_pagerank_uniform_unchanged_by_refactor(spark):
    from spandex_spark.operators.linkgraph import pagerank
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    nodes = sorted({x for p in edges for x in p})
    exp = _pr_numpy(edges, nodes, 0.85, 12)
    got = {r.node: r.rank for r in
           pagerank(_edges(spark, edges), iters=12).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for x in nodes:
        assert got[x] == pytest.approx(exp[x], abs=1e-9)


def test_trustrank_teleport_demotes_unreachable_spam(spark):
    from spandex_spark.operators.linkgraph import pagerank
    # spam farm (s1<->s2<->s3) disconnected from the trusted web
    edges = [("t", "a"), ("a", "b"), ("b", "t"),
             ("s1", "s2"), ("s2", "s3"), ("s3", "s1"),
             ("s1", "s3"), ("s2", "s1")]
    nodes = sorted({x for p in edges for x in p})
    seeds = spark.createDataFrame([("t", 1.0)], "node string, weight double")
    got = {r.node: r.rank for r in
           pagerank(_edges(spark, edges), iters=15,
                    teleport=seeds).collect()}
    exp = _pr_numpy(edges, nodes, 0.85, 15, t={"t": 1.0})
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for x in nodes:
        assert got[x] == pytest.approx(exp[x], abs=1e-9)
    # spam farm gets EXACTLY zero trust — it cannot reach restart mass
    for s in ("s1", "s2", "s3"):
        assert got[s] == 0.0
    # uniform-teleport PageRank would rank the farm ABOVE the real web
    uni = {r.node: r.rank for r in
           pagerank(_edges(spark, edges), iters=15).collect()}
    assert max(uni[s] for s in ("s1", "s2", "s3")) > uni["a"]


def test_teleport_validation(spark):
    from spandex_spark.operators.linkgraph import pagerank
    seeds = spark.createDataFrame([("x", 0.0)], "node string, weight double")
    with pytest.raises(ValueError, match="teleport"):
        pagerank(_edges(spark, [("a", "b")]), teleport=seeds).collect()


def test_teleport_seed_absent_from_graph_keeps_mass(spark):
    from spandex_spark.operators.linkgraph import pagerank
    edges = [("a", "b"), ("b", "a")]
    # one seed in the graph, one absent: normalization must restrict
    # to graph nodes or rank mass leaks every round
    seeds = spark.createDataFrame([("a", 1.0), ("ghost", 3.0)],
                                  "node string, weight double")
    got = {r.node: r.rank for r in
           pagerank(_edges(spark, edges), iters=10,
                    teleport=seeds).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    exp = _pr_numpy(edges, ["a", "b"], 0.85, 10, t={"a": 1.0})
    for x in ("a", "b"):
        assert got[x] == pytest.approx(exp[x], abs=1e-9)


def test_extract_anchors_ignores_data_href(spark):
    pages = spark.createDataFrame([
        ("http://a.com/",
         '<a class="x" data-href="http://tracker.example/t" '
         'href="/relative">text</a> '
         '<a data-href="http://t2.example/" href="http://real.example/">'
         'ok</a>'),
    ], "url string, html string")
    got = {(r.dst_url, r.anchor) for r in extract_anchors(pages).collect()}
    # first <a> has only a RELATIVE real href: excluded entirely;
    # second <a> must attribute to the real href, not the data-href
    assert got == {("http://real.example/", "ok")}
