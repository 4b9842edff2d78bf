"""BM25 (operators/search.py): python brute-force parity on the
documents fixture, length-normalization and idf ordering sanity,
prune/edge semantics."""

import math
import os

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.search import bm25_rank


def _brute_bm25(texts, query, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in texts.items()}
    n = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / n
    terms = sorted({t.lower() for t in query})
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s, m = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            m += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if m:
            out[i] = (round(s, 9), m)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    path = os.path.join(sf, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    return spark.read.parquet(path)


def test_matches_brute_force_on_fixture(spark, docs):
    sample = docs.limit(200)
    texts = {r["doc_id"]: r["text"] for r in sample.collect()}
    query = ["the", "data", "zone", "quality"]
    got = {r["doc_id"]: (r["score"], r["n_matched"])
           for r in bm25_rank(sample, query).collect()}
    want = _brute_bm25(texts, query)
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert got[k][0] == pytest.approx(want[k][0], abs=2e-9)


def test_shorter_doc_wins_at_equal_tf(spark):
    df = spark.createDataFrame(
        [(1, "apple banana"), (2, "apple banana pear plum fig date")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in
           bm25_rank(df, ["apple"]).collect()}
    assert got[1] > got[2]


def test_rare_term_outranks_common(spark):
    rows = [(i, "common filler words here") for i in range(10)]
    rows.append((10, "common rareword"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in
           bm25_rank(df, ["common", "rareword"]).collect()}
    # doc 10 matches both, and rareword's idf dominates
    assert got[10] == max(got.values())
    assert len(got) == 11


def test_prune_and_topk(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "a b c"), (3, "x x a")],
        "doc_id long, text string")
    out = bm25_rank(df, ["x", "a"], top_k=2)
    rows = out.collect()
    assert len(rows) == 2
    # doc 2 (only 'a') or doc 3 (both) survive; doc 3 first
    assert rows[0]["doc_id"] == 3 and rows[0]["n_matched"] == 2
    # no-match docs never appear even without top_k
    all_rows = bm25_rank(df, ["zzz", "x"]).collect()
    assert {r["doc_id"] for r in all_rows} == {1, 3}
    with pytest.raises(ValueError):
        bm25_rank(df, ["  ", ""])


def test_plan_stays_jvm(spark, docs):
    plan = bm25_rank(docs, ["zone", "data"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
