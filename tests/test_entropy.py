"""entropy_stats (operators/textstats.py): closed-form entropies,
empty/NULL conventions, numpy parity on the documents fixture,
JVM-only plan."""

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.textstats import entropy_stats


def test_closed_forms(spark):
    df = spark.createDataFrame(
        [(1, "aa bb AA"), (2, "x x x x"), (3, ""), (4, None),
         (5, "one")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           entropy_stats(df, include_chars=True).collect()}
    h3 = -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3))
    assert got[1]["n_tokens"] == 3 and got[1]["distinct_tokens"] == 2
    assert got[1]["word_entropy"] == pytest.approx(h3, rel=1e-12)
    # chars of "aabbaa": a x4, b x2 -> same 2/3-1/3 split
    assert got[1]["char_entropy"] == pytest.approx(h3, rel=1e-12)
    assert got[2]["word_entropy"] == 0.0           # all same token
    assert got[3]["n_tokens"] == 0 and got[3]["word_entropy"] is None
    assert got[4]["word_entropy"] is None
    assert got[5]["word_entropy"] == 0.0           # single token


def test_numpy_parity_on_fixture(spark):
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    path = os.path.join(sf, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    docs = spark.read.parquet(path).limit(100)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: r for r in entropy_stats(docs).collect()}
    for did, t in texts.items():
        toks = t.lower().split()
        if not toks:
            assert got[did]["word_entropy"] is None
            continue
        _, counts = np.unique(toks, return_counts=True)
        p = counts / counts.sum()
        want = float(-(p * np.log2(p)).sum())
        assert got[did]["n_tokens"] == len(toks)
        assert got[did]["word_entropy"] == pytest.approx(
            want, rel=1e-9, abs=1e-12)


def test_plan_stays_jvm(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = entropy_stats(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
