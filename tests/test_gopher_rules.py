"""Gopher quality-filter rules (operators/textstats.py::gopher_rules)."""

import os

from spandex_spark.operators.textstats import gopher_rules

GOOD = ("the quick brown fox jumps over the lazy dog and runs far away "
        "with great speed while the sun sets over the quiet hills and "
        "people walk home in the evening light to rest and eat dinner "
        "with their families before the long night begins again soon") \
    + " extra words here to pass the fifty word minimum for the filter"


def _run(spark, texts, **kw):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    return {r["i"]: r for r in gopher_rules(df, **kw).collect()}


def test_good_document_passes(spark):
    out = _run(spark, [GOOD])
    r = out[0]
    assert r["gopher_pass"] is True
    for k in ("r_word_count", "r_mean_word_len", "r_symbol_ratio",
              "r_bullet_ratio", "r_ellipsis_ratio",
              "r_alpha_word_ratio", "r_stopwords"):
        assert r[k] is True, k


def test_too_short_fails_word_count_only_that_rule(spark):
    out = _run(spark, ["the cat sat on the mat with that dog"])
    r = out[0]
    assert r["r_word_count"] is False and r["gopher_pass"] is False
    assert r["r_stopwords"] is True  # other rules judged independently


def test_symbol_ratio(spark):
    # 10 words, 3 hashes -> ratio 0.3 > 0.1
    out = _run(spark, ["# # # one two three four five six seven"],
               min_words=1)
    assert out[0]["r_symbol_ratio"] is False
    out2 = _run(spark, ["one two three four five six seven eight nine ten"],
                min_words=1)
    assert out2[0]["r_symbol_ratio"] is True


def test_ellipsis_and_bullet_lines(spark):
    text = "read more...\nsee also...\n- item one\nplain line"
    out = _run(spark, [text], min_words=1)
    r = out[0]
    assert r["r_ellipsis_ratio"] is False        # 2/4 = 0.5 > 0.3
    assert r["r_bullet_ratio"] is True           # 1/4 <= 0.9
    bullets = "\n".join(["- x"] * 10)
    out2 = _run(spark, [bullets], min_words=1)
    assert out2[0]["r_bullet_ratio"] is False    # 10/10 > 0.9


def test_alpha_word_ratio(spark):
    out = _run(spark, ["111 222 333 444 555 666 777 888 999 000"],
               min_words=1)
    assert out[0]["r_alpha_word_ratio"] is False


def test_mean_word_length_bounds(spark):
    out = _run(spark, ["a b c d e f g h i j"], min_words=1)
    assert out[0]["r_mean_word_len"] is False    # mean 1 < 3
    long_word = "supercalifragilistic " * 10
    out2 = _run(spark, [long_word], min_words=1)
    assert out2[0]["r_mean_word_len"] is False   # mean 20 > 10


def test_fixture_corpus_all_jvm(spark, fixture_dir):
    import pyspark.sql.functions as F
    docs = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    out = gopher_rules(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan
    n = out.count()
    assert out.filter(F.col("gopher_pass").isNotNull()).count() == n
