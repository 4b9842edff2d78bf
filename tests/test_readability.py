"""Readability (operators/textstats.py::readability): hand-counted
closed forms, clamping, empty-text NULLs, DuckDB same-regex parity,
zero-Python plan."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.textstats import readability


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string")


def test_hand_counted(spark):
    # "the cat sat." -> 3 words, 1 sentence, syllables: the=1 cat=1
    # sat=1 => ease = 206.835 - 1.015*3 - 84.6*1 = 119.19
    r = readability(_df(spark, ["the cat sat."])).collect()[0]
    assert r["n_words"] == 3 and r["n_sentences"] == 1
    assert r["n_syllables"] == 3
    assert abs(r["flesch_ease"] - (206.835 - 1.015 * 3 - 84.6)) < 1e-9
    assert abs(r["fk_grade"] - (0.39 * 3 + 11.8 - 15.59)) < 1e-9


def test_vowel_groups_and_floor(spark):
    # "rhythm" has no aeiouy-run except 'y' -> 1; "queueing" has
    # ueuei as one run + nothing else -> 1... spelled: q-ueuei-ng -> 1
    r = readability(_df(spark, ["rhythm queueing xyz"])).collect()[0]
    # rhythm: 'y' -> 1; queueing: 'ueuei' -> 1; xyz: 'y' -> 1
    assert r["n_syllables"] == 3
    # consonant-only word floors at 1
    r2 = readability(_df(spark, ["zzz bcdf!"])).collect()[0]
    assert r2["n_syllables"] == 2


def test_sentences_runs_and_floor(spark):
    r = readability(_df(spark, ["Wait... what?! Really. no end"])).collect()[0]
    assert r["n_sentences"] == 3       # "...", "?!", "." runs
    r2 = readability(_df(spark, ["no terminal punctuation at all"])).collect()[0]
    assert r2["n_sentences"] == 1      # floor


def test_empty_text_nulls(spark):
    r = readability(_df(spark, ["   "])).collect()[0]
    assert r["n_words"] is None and r["flesch_ease"] is None


def test_clamp(spark):
    # pathological single "word" of consonants repeated across many
    # sentences pushes ease below -100 -> clamped
    r = readability(_df(spark, ["aaaaaaaae " * 2])).collect()[0]
    assert r["flesch_ease"] <= 121.22


def test_duckdb_parity_on_documents(spark):
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    path = os.path.join(sf, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    docs = spark.read.parquet(path)
    got = {r["doc_id"]: (r["n_words"], r["n_sentences"], r["n_syllables"])
           for r in readability(docs).select(
               "doc_id", "n_words", "n_sentences", "n_syllables").collect()}
    want = duckdb.sql(f"""
        SELECT doc_id,
               len(list_filter(string_split(trim(text), ' '),
                               w -> w <> '')) AS n_words,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS n_sentences,
               list_sum(list_transform(
                   list_filter(string_split(trim(text), ' '), w -> w <> ''),
                   w -> greatest(len(regexp_extract_all(w,
                                     '[aeiouyAEIOUY]+')), 1))) AS n_syl
        FROM read_parquet('{path}') WHERE trim(text) <> ''
    """).fetchall()
    assert len(want) > 0
    for doc_id, nw, ns, nsy in want:
        assert got[doc_id] == (nw, ns, nsy), doc_id


def test_zero_python_plan(spark):
    out = readability(_df(spark, ["some text here."]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
