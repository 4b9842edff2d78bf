"""Eval-set decontamination (operators/dedup.py::decontaminate):
planted verbatim spans, the 12-of-13-word near miss, short-item floor
grams, hashed-vs-string key equality, and DuckDB n-gram parity on the
documents fixture."""

import os

import duckdb
import pytest

from spandex_spark.operators.dedup import decontaminate

W = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
     "kilo lima mike november oscar papa quebec romeo sierra tango").split()


def _span(a, b):
    return " ".join(W[a:b])


def test_planted_span_and_near_miss(spark):
    # doc 0 embeds a verbatim 13-word benchmark span; doc 1 shares only
    # a 12-word window (drops the last word); doc 2 is disjoint text
    bench = spark.createDataFrame([(_span(0, 13),)], "text string")
    corpus = spark.createDataFrame([
        (0, "prefix words here " + _span(0, 13) + " suffix words"),
        (1, "prefix words here " + _span(0, 12) + " zulu suffix words"),
        (2, "totally different content with no overlap at all whatsoever "
            "in any window of thirteen consecutive words here friend"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           decontaminate(corpus, bench, n=13).collect()}
    assert set(got) == {0}
    assert got[0]["n_matched"] == 1
    assert got[0]["n_grams"] == 6      # 18 words -> 18-13+1 distinct grams


def test_matched_gram_count_exact(spark):
    # doc = 15 words fully inside a 20-word benchmark: every 13-gram of
    # the doc (15-13+1 = 3) appears in the benchmark
    bench = spark.createDataFrame([(_span(0, 20),)], "text string")
    corpus = spark.createDataFrame([(7, _span(2, 17))],
                                   "doc_id long, text string")
    r = decontaminate(corpus, bench, n=13).collect()[0]
    assert r["n_matched"] == 3 and r["n_grams"] == 3
    assert r["contamination_ratio"] == 1.0


def test_short_item_floor_gram(spark):
    # benchmark item shorter than n matches only a verbatim short doc,
    # not the long doc containing it (the documented blind spot)
    bench = spark.createDataFrame([("exact short answer",)], "text string")
    corpus = spark.createDataFrame([
        (0, "exact short answer"),
        (1, "a long document that contains the exact short answer inside "
            "a much longer run of words " + _span(0, 13)),
    ], "doc_id long, text string")
    got = {r["doc_id"] for r in decontaminate(corpus, bench, n=13).collect()}
    assert got == {0}


def test_case_normalization(spark):
    bench = spark.createDataFrame([(_span(0, 13).upper(),)], "text string")
    corpus = spark.createDataFrame([(0, _span(0, 13))],
                                   "doc_id long, text string")
    assert len(decontaminate(corpus, bench, n=13).collect()) == 1
    assert len(decontaminate(corpus, bench, n=13,
                             lowercase=False).collect()) == 0


def test_hashed_equals_string_keys(spark):
    bench = spark.createDataFrame(
        [(_span(0, 14),), (_span(5, 19),)], "text string")
    corpus = spark.createDataFrame(
        [(i, _span(i, i + 14)) for i in range(6)], "doc_id long, text string")
    a = sorted((r["doc_id"], r["n_matched"], r["n_grams"]) for r in
               decontaminate(corpus, bench, n=13, hashed=True).collect())
    b = sorted((r["doc_id"], r["n_matched"], r["n_grams"]) for r in
               decontaminate(corpus, bench, n=13, hashed=False).collect())
    assert a == b and len(a) > 0


def test_duckdb_parity_on_documents(spark):
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    path = os.path.join(sf, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    docs = spark.read.parquet(path)
    bench = docs.filter("doc_id < 5").select("text")
    corpus = docs.filter("doc_id >= 5")
    got = sorted((r["doc_id"], r["n_matched"], r["n_grams"]) for r in
                 decontaminate(corpus, bench, n=8).collect())
    want = duckdb.sql(f"""
        WITH w AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                                                  'g')), ' ') AS t
          FROM read_parquet('{path}')
        ), grams AS (
          SELECT doc_id,
                 array_to_string(t[g.g:g.g+7], ' ') AS gram
          FROM w, (SELECT unnest(generate_series(1, 100000)) AS g) g
          WHERE g.g <= greatest(len(t) - 7, 1)
        ), bench AS (
          SELECT DISTINCT gram FROM grams WHERE doc_id < 5
        ), cg AS (
          SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id >= 5
        ), tot AS (
          SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY doc_id
        )
        SELECT cg.doc_id, count(*) AS n_matched, any_value(tot.n_grams)
        FROM cg JOIN bench USING (gram) JOIN tot USING (doc_id)
        GROUP BY cg.doc_id ORDER BY cg.doc_id
    """).fetchall()
    assert got == [tuple(r) for r in want]
    assert len(got) > 0
