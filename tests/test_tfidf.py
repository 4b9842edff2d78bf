"""TF-IDF top terms (operators/textstats.py::tfidf_top_terms):
hand-computed closed form, determinism of tie-breaks, min_df filtering,
and full DuckDB parity on the documents fixture."""

import math
import os

import duckdb
import pytest

from spandex_spark.operators.textstats import tfidf_top_terms


def test_closed_form(spark):
    df = spark.createDataFrame([
        (0, "apple apple banana"),
        (1, "banana cherry"),
        (2, "cherry cherry cherry durian"),
    ], "doc_id long, text string")
    rows = {(r["doc_id"], r["term"]): r
            for r in tfidf_top_terms(df, k=10).collect()}
    n = 3

    def idf(dfreq):
        return math.log((1 + n) / (1 + dfreq)) + 1

    # apple: tf=2 df=1 in doc 0
    assert rows[(0, "apple")]["tf"] == 2
    assert abs(rows[(0, "apple")]["tfidf"] - 2 * idf(1)) < 1e-8
    # banana: df=2
    assert rows[(0, "banana")]["df"] == 2
    assert abs(rows[(1, "banana")]["tfidf"] - idf(2)) < 1e-8
    # top-1 of doc 2 is cherry (tf=3)
    assert rows[(2, "cherry")]["rank"] == 1
    # durian rank 2 with tf=1 df=1
    assert rows[(2, "durian")]["rank"] == 2


def test_rank_tiebreak_by_term(spark):
    df = spark.createDataFrame([(0, "zebra alpha")],
                               "doc_id long, text string")
    rows = sorted((r["rank"], r["term"]) for r in
                  tfidf_top_terms(df, k=2).collect())
    # equal tf and df -> alphabetical
    assert rows == [(1, "alpha"), (2, "zebra")]


def test_min_df_filters_rare_terms(spark):
    df = spark.createDataFrame([
        (0, "shared rare0"), (1, "shared rare1"), (2, "shared rare2"),
    ], "doc_id long, text string")
    terms = {r["term"] for r in
             tfidf_top_terms(df, k=5, min_df=2).collect()}
    assert terms == {"shared"}


def test_k_limits_rows(spark):
    df = spark.createDataFrame([(0, "a b c d e f g h")],
                               "doc_id long, text string")
    assert tfidf_top_terms(df, k=3).count() == 3


def test_duckdb_parity_on_documents(spark):
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    path = os.path.join(sf, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    docs = spark.read.parquet(path)
    got = sorted((r["doc_id"], r["rank"], r["term"], r["tf"], r["df"],
                  r["tfidf"]) for r in tfidf_top_terms(docs, k=3).collect())
    want = duckdb.sql(f"""
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(string_split(
                     trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                     ' '), w -> w <> '')) AS term
          FROM read_parquet('{path}')
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        ), dfreq AS (
          SELECT term, count(*) AS df FROM tf GROUP BY 1
        ), n AS (
          SELECT count(DISTINCT doc_id) AS n_docs
          FROM read_parquet('{path}')
        ), scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                 round(tf.tf * (ln((1.0 + n.n_docs) / (1.0 + dfreq.df))
                                + 1.0), 9) AS tfidf,
                 row_number() OVER (PARTITION BY tf.doc_id
                                    ORDER BY tf.tf * (ln((1.0 + n.n_docs)
                                        / (1.0 + dfreq.df)) + 1.0) DESC,
                                    tf.term ASC) AS rank
          FROM tf JOIN dfreq USING (term) CROSS JOIN n
        )
        SELECT doc_id, rank, term, tf, df, tfidf
        FROM scored WHERE rank <= 3 ORDER BY doc_id, rank
    """).fetchall()
    assert len(got) == len(want) > 0
    for g, w in zip(got, [tuple(r) for r in want]):
        assert g[:5] == w[:5]
        assert abs(g[5] - w[5]) < 1e-8
