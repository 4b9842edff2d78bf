"""Temperature resampling (operators/sampling.py::temperature_resample):
pure-Python md5 replication of the exact output multiset, alpha
endpoint closed forms (1 = natural, 0 = equalized), upsampling via the
copy column, the max_upsample cap, the empty-sequence explode guard,
and validation."""

import hashlib
import math

import pytest

from spandex_spark.operators.sampling import temperature_resample


def _df(spark, sizes):
    rows = []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def _py_rates(sizes, alpha, target, cap):
    tot = sum(sizes.values())
    qs = {s: (n / tot) ** alpha for s, n in sizes.items()}
    z = sum(qs.values())
    return {s: min(cap, target * (q / z) / sizes[s])
            for s, q in qs.items()}


def _py_copies(doc_id, rate, seed=42):
    whole = math.floor(rate)
    frac = rate - whole
    h = int(hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:8], 16)
    return whole + (1 if h < frac * 16 ** 8 else 0)


def test_exact_multiset_replication(spark):
    sizes = {"en": 900, "fr": 80, "sw": 20}
    df = _df(spark, sizes)
    got = {}
    for r in temperature_resample(df, source_col="source",
                                  id_col="doc_id", alpha=0.3,
                                  target_total=500).collect():
        got[r.doc_id] = got.get(r.doc_id, 0) + 1
    rates = _py_rates(sizes, 0.3, 500, 8.0)
    src_of = {}
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            src_of[i] = s
            i += 1
    exp = {d: _py_copies(d, rates[src_of[d]]) for d in src_of}
    exp = {d: c for d, c in exp.items() if c > 0}
    assert got == exp


def test_alpha_zero_equalizes(spark):
    sizes = {"a": 1000, "b": 100}
    df = _df(spark, sizes)
    out = temperature_resample(df, source_col="source", id_col="doc_id",
                               alpha=0.0, target_total=400)
    per = {r.source: r.n for r in
           out.groupBy("source").count()
           .withColumnRenamed("count", "n").collect()}
    # expectation is 200 per source; md5 Bernoulli noise is small
    assert abs(per["a"] - 200) < 40
    assert abs(per["b"] - 200) < 40
    # the small source upsamples: some rows must carry copy >= 1
    assert out.where((out.source == "b") & (out.copy >= 1)).count() > 0


def test_alpha_one_keeps_natural_shares(spark):
    sizes = {"a": 800, "b": 200}
    df = _df(spark, sizes)
    out = temperature_resample(df, source_col="source", id_col="doc_id",
                               alpha=1.0, target_total=500)
    per = {r.source: r.n for r in
           out.groupBy("source").count()
           .withColumnRenamed("count", "n").collect()}
    assert abs(per["a"] - 400) < 40 and abs(per["b"] - 100) < 25


def test_max_upsample_cap(spark):
    sizes = {"big": 1000, "tiny": 5}
    df = _df(spark, sizes)
    out = temperature_resample(df, source_col="source", id_col="doc_id",
                               alpha=0.0, target_total=2000,
                               max_upsample=3.0)
    tiny = out.where(out.source == "tiny")
    assert tiny.count() <= 5 * 3           # cap respected
    assert tiny.groupBy("doc_id").count().agg(
        {"count": "max"}).collect()[0][0] <= 3


def test_dropped_rows_emit_no_phantom_copies(spark):
    # alpha=1 with target far below corpus: rates < 1, many rows get
    # zero copies — the sequence(0, -1) guard must drop them entirely
    sizes = {"a": 500}
    df = _df(spark, sizes)
    out = temperature_resample(df, source_col="source", id_col="doc_id",
                               alpha=1.0, target_total=50)
    assert out.where(out.copy < 0).count() == 0
    assert 20 <= out.count() <= 90         # ~50 expected


def test_validation(spark):
    df = _df(spark, {"a": 3})
    with pytest.raises(ValueError):
        temperature_resample(df, source_col="source", id_col="doc_id",
                             alpha=-1.0, target_total=10)
    with pytest.raises(ValueError):
        temperature_resample(df, source_col="source", id_col="doc_id",
                             alpha=0.5, target_total=0)
    with pytest.raises(ValueError):
        temperature_resample(df, source_col="source", id_col="doc_id",
                             alpha=0.5, target_total=10, max_upsample=0.5)


def test_null_source_is_its_own_group(spark):
    rows = ([(i, "en") for i in range(300)]
            + [(1000 + i, None) for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_resample(df, source_col="source", id_col="doc_id",
                               alpha=0.0, target_total=200)
    per = {r.source: r.n for r in
           out.groupBy("source").count()
           .withColumnRenamed("count", "n").collect()}
    # alpha=0 equalizes: ~100 each, NULL included as a real group
    assert abs(per.get("en", 0) - 100) < 30
    assert abs(per.get(None, 0) - 100) < 30
