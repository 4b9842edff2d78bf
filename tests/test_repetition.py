"""Gopher repetition signals (operators/textstats.py::repetition_ratios)."""

import pytest

from spandex_spark.operators.textstats import repetition_ratios


def _run(spark, texts, **kw):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    return {r["i"]: r for r in repetition_ratios(df, **kw).collect()}


def test_no_repetition_passes(spark):
    r = _run(spark, ["alpha beta\ngamma delta\nepsilon zeta"])[0]
    assert r["dup_line_frac"] == 0.0
    assert r["dup_line_char_frac"] == 0.0
    assert r["top_word_frac"] == pytest.approx(1 / 6)
    assert r["repetition_pass"] is True


def test_duplicate_lines_counted_exactly(spark):
    # 4 lines, "same line" appears 3x -> 2 repeats; chars: repeats carry
    # 2*9=18 of 9+9+9+5=32 non-newline line chars
    text = "same line\nsame line\nsame line\nother"
    r = _run(spark, [text])[0]
    assert r["dup_line_frac"] == pytest.approx(2 / 4)
    assert r["dup_line_char_frac"] == pytest.approx(18 / 32)
    assert r["r_dup_lines"] is False and r["repetition_pass"] is False


def test_top_word_fraction_max_run(spark):
    # 10 words, 'spam' 4x (case-insensitive), others distinct
    text = "Spam a spam b SPAM c spam d e f"
    r = _run(spark, [text])[0]
    assert r["top_word_frac"] == pytest.approx(4 / 10)
    assert r["r_top_word"] is False


def test_empty_and_blank_lines(spark):
    r = _run(spark, ["", "\n\n\n"])
    for i in (0, 1):
        assert r[i]["dup_line_frac"] == 0.0
        assert r[i]["top_word_frac"] == 0.0
        assert r[i]["repetition_pass"] is True


def test_threshold_overrides(spark):
    text = "x x x x x y"  # top word 5/6
    r = _run(spark, [text], max_top_word_frac=0.9)[0]
    assert r["r_top_word"] is True


def test_all_jvm(spark):
    df = spark.createDataFrame([(1, "a b c\na b c")], "i long, text string")
    plan = (repetition_ratios(df)
            ._jdf.queryExecution().executedPlan().toString())
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "Exchange hashpartitioning" not in plan
