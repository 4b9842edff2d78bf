"""Deterministic sampling (operators/sampling.py): exact per-stratum
caps, repartition determinism, row-for-row DuckDB parity (the md5
portability contract), fraction proportions, and seed independence."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.sampling import sample_fraction, stratified_sample


def _docs(spark):
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    path = os.path.join(sf, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    return spark.read.parquet(path), path


def test_exact_cap_per_stratum(spark):
    df, _ = _docs(spark)
    out = stratified_sample(df, strata_col="lang", n=7, id_col="doc_id")
    per = {r["lang"]: r["cnt"] for r in
           out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    avail = {r["lang"]: r["cnt"] for r in
             df.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    for lang, c in per.items():
        assert c == min(7, avail[lang])


def test_repartition_deterministic(spark):
    df, _ = _docs(spark)
    a = {r["doc_id"] for r in stratified_sample(
        df, strata_col="lang", n=5, id_col="doc_id").collect()}
    b = {r["doc_id"] for r in stratified_sample(
        df.repartition(11), strata_col="lang", n=5,
        id_col="doc_id").collect()}
    assert a == b


def test_duckdb_row_for_row_parity(spark):
    df, path = _docs(spark)
    got = sorted(r["doc_id"] for r in stratified_sample(
        df, strata_col="lang", n=4, id_col="doc_id", seed=7).collect())
    want = [r[0] for r in duckdb.sql(f"""
        SELECT doc_id FROM (
          SELECT doc_id,
                 row_number() OVER (
                     PARTITION BY lang
                     ORDER BY md5('7' || '|' || CAST(doc_id AS VARCHAR)),
                              doc_id) AS rk
          FROM read_parquet('{path}')
        ) WHERE rk <= 4 ORDER BY doc_id
    """).fetchall()]
    assert got == want and len(got) > 0


def test_fraction_parity_and_proportion(spark):
    df, path = _docs(spark)
    frac = 0.3
    got = sorted(r["doc_id"] for r in sample_fraction(
        df, fraction=frac, id_col="doc_id", seed=3).collect())
    thr = format(int(frac * 16 ** 8), "08x")
    want = [r[0] for r in duckdb.sql(f"""
        SELECT doc_id FROM read_parquet('{path}')
        WHERE substr(md5('3' || '|' || CAST(doc_id AS VARCHAR)), 1, 8)
              < '{thr}'
        ORDER BY doc_id
    """).fetchall()]
    assert got == want
    n = df.count()
    assert abs(len(got) / n - frac) < 0.08       # binomial tolerance


def test_fraction_edges_and_seed_independence(spark):
    df, _ = _docs(spark)
    assert sample_fraction(df, fraction=1.0, id_col="doc_id").count() \
        == df.count()
    assert sample_fraction(df, fraction=0.0, id_col="doc_id").count() == 0
    a = {r["doc_id"] for r in sample_fraction(
        df, fraction=0.5, id_col="doc_id", seed=1).collect()}
    b = {r["doc_id"] for r in sample_fraction(
        df, fraction=0.5, id_col="doc_id", seed=2).collect()}
    assert a != b                                 # different draws
    # same seed -> identical
    c = {r["doc_id"] for r in sample_fraction(
        df, fraction=0.5, id_col="doc_id", seed=1).collect()}
    assert a == c


def test_bad_args(spark):
    df, _ = _docs(spark)
    with pytest.raises(ValueError):
        stratified_sample(df, strata_col="lang", n=0, id_col="doc_id")
    with pytest.raises(ValueError):
        sample_fraction(df, fraction=1.5, id_col="doc_id")


def test_stratified_fraction_sample(spark):
    from spandex_spark.operators.sampling import (sample_fraction,
                                                  stratified_fraction_sample)
    df = spark.createDataFrame(
        [(i, "en" if i % 3 == 0 else ("fr" if i % 3 == 1 else "de"))
         for i in range(3000)], "doc_id long, lang string")
    out = stratified_fraction_sample(
        df, fractions={"en": 0.1, "fr": 1.0}, strata_col="lang",
        id_col="doc_id")
    rows = out.collect()
    by = {}
    for r in rows:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    # fr kept verbatim, de dropped (default 0), en thinned ~10%
    assert len(by["fr"]) == 1000 and "de" not in by
    assert 50 < len(by["en"]) < 160
    # row-for-row equal to sample_fraction on the en slice (same hash)
    en_only = {r["doc_id"] for r in sample_fraction(
        df.filter("lang = 'en'"), fraction=0.1,
        id_col="doc_id").collect()}
    assert by["en"] == en_only
    # deterministic rerun + different seed differs
    again = stratified_fraction_sample(
        df, fractions={"en": 0.1, "fr": 1.0}, strata_col="lang",
        id_col="doc_id").collect()
    assert {(r["doc_id"]) for r in again} == {r["doc_id"] for r in rows}
    other = stratified_fraction_sample(
        df, fractions={"en": 0.1, "fr": 1.0}, strata_col="lang",
        id_col="doc_id", seed=7)
    assert {r["doc_id"] for r in other.filter("lang='en'").collect()} \
        != by["en"]
    with pytest.raises(ValueError):
        stratified_fraction_sample(df, fractions={"en": 1.5},
                                   strata_col="lang", id_col="doc_id")
    # zero Python, zero shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in final and "ArrowEvalPython" not in final
