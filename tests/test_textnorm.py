"""Text normalisation (operators/textnorm.py): NFC/NFKC closed forms,
idempotency, control stripping, dedup-equivalence motivation, and the
codegen purity of encoding_stats."""


import pytest

from spandex_spark.operators.textnorm import encoding_stats, normalize_text

COMPOSED = "caf\u00e9"        # e-acute precomposed
DECOMPOSED = "cafe\u0301"    # e + combining acute
LIGATURE = "\ufb01le"         # fi-ligature + "le"
FULLWIDTH = "\uff28\uff29"    # fullwidth H, I


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "id long, text string")


def test_nfc_makes_equivalents_byte_equal(spark):
    out = normalize_text(_df(spark, [COMPOSED, DECOMPOSED]))
    a, b = [r["text"] for r in out.orderBy("id").collect()]
    assert a == b == COMPOSED
    # the dedup motivation: distinct() now collapses them
    assert out.select("text").distinct().count() == 1


def test_nfkc_folds_compat_forms_nfc_does_not(spark):
    df = _df(spark, [LIGATURE, FULLWIDTH])
    nfc = [r["text"] for r in normalize_text(df).orderBy("id").collect()]
    nfkc = [r["text"] for r in
            normalize_text(df, form="NFKC").orderBy("id").collect()]
    assert nfc == [LIGATURE, FULLWIDTH]       # NFC preserves compat chars
    assert nfkc == ["file", "HI"]


def test_idempotent_and_null(spark):
    rows = [COMPOSED, DECOMPOSED, LIGATURE, None, "plain ascii"]
    once = normalize_text(_df(spark, rows))
    twice = normalize_text(once)
    a = [r["text"] for r in once.orderBy("id").collect()]
    b = [r["text"] for r in twice.orderBy("id").collect()]
    assert a == b and a[3] is None


def test_control_stripping(spark):
    out = normalize_text(_df(spark, ["a\x00b\x1fc\td\ne\x7ff"]))
    assert out.collect()[0]["text"] == "abc\td\nef"
    kept = normalize_text(_df(spark, ["a\x00b"]), strip_control=False)
    assert kept.collect()[0]["text"] == "a\x00b"


def test_encoding_stats_and_plan(spark):
    df = _df(spark, ["clean text", "bro�ken �", "ctl\x00\x01"])
    out = encoding_stats(df)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[0]["n_replacement"] == 0 and rows[0]["n_control"] == 0
    assert rows[1]["n_replacement"] == 2
    assert rows[2]["n_control"] == 2
    assert rows[1]["replacement_ratio"] == pytest.approx(2 / 9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan


def test_bad_form_rejected(spark):
    with pytest.raises(ValueError, match="normal form"):
        normalize_text(_df(spark, ["x"]), form="NFX")


def test_out_col_keeps_original(spark):
    out = normalize_text(_df(spark, [DECOMPOSED]), out_col="norm")
    r = out.collect()[0]
    assert r["text"] == DECOMPOSED and r["norm"] == COMPOSED
