"""Quality classifier (operators/quality_model.py): learns to separate
planted good/junk docs, codegen scoring == numpy scoring bit-for-bit,
deterministic training, JVM-only scoring plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.quality_model import (
    FEATURES, apply_quality_model, quality_features,
    train_quality_model)


def _corpus(spark, n=300, seed=5):
    rng = np.random.default_rng(seed)
    words = ("the and for with this that from have not are was his her "
             "they would there what about which when into other").split()
    rows = []
    for i in range(n):
        if i % 2 == 0:
            txt = " ".join(rng.choice(words, 40)) + "."
            rows.append((i, txt, 1))
        else:
            junk = "".join(rng.choice(list("0123456789!?.,;#$%"), 120))
            rows.append((i, junk, 0))
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "label int")


def test_learns_separation_and_generalizes(spark):
    train = _corpus(spark, 300, seed=5)
    test = _corpus(spark, 200, seed=99)
    model = train_quality_model(train, label_col="label",
                                sample_rows=300)
    scored = apply_quality_model(test, model).collect()
    acc = np.mean([(r["quality_p"] > 0.5) == (r["label"] == 1)
                   for r in scored])
    assert acc > 0.95
    # probabilities are confident and well-ordered
    good = [r["quality_p"] for r in scored if r["label"] == 1]
    bad = [r["quality_p"] for r in scored if r["label"] == 0]
    assert min(good) > max(bad)


def test_codegen_scoring_matches_numpy(spark):
    df = _corpus(spark, 60)
    model = train_quality_model(df, label_col="label", sample_rows=60)
    feats = quality_features(df).select("doc_id", *FEATURES).collect()
    got = {r["doc_id"]: r["quality_p"] for r in
           apply_quality_model(df, model).collect()}
    mu = np.array(model["mu"])
    sd = np.array(model["sd"])
    w = np.array(model["w"])
    for r in feats:
        x = np.array([r[f] for f in FEATURES])
        z = ((x - mu) / sd) @ w + model["b"]
        want = 1.0 / (1.0 + np.exp(-z))
        assert got[r["doc_id"]] == pytest.approx(want, rel=1e-12)


def test_training_determinism(spark):
    df = _corpus(spark, 200)
    m1 = train_quality_model(df, label_col="label", sample_rows=150)
    m2 = train_quality_model(df.repartition(13), label_col="label",
                             sample_rows=150)
    assert m1 == m2
    with pytest.raises(ValueError):
        train_quality_model(df.limit(5), label_col="label")


def test_scoring_plan_jvm_and_null_text(spark):
    df = _corpus(spark, 40)
    model = train_quality_model(df, label_col="label", sample_rows=40)
    nulldf = spark.createDataFrame([(1, None, 0)],
                                   "doc_id long, text string, label int")
    assert apply_quality_model(nulldf, model).collect()[0]["quality_p"] \
        is None
    plan = apply_quality_model(df, model)._jdf.queryExecution() \
        .executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "ArrowEvalPython" not in final and "Exchange" not in final
