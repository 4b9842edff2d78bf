"""Corpus-wide line-level dedup (operators/dedup.py::line_dedup):
C4/RefinedWeb-style boilerplate removal with byte-fidelity guarantees."""

from pyspark.sql import functions as F

from spandex_spark.operators.dedup import line_dedup


def _df(spark, rows, with_ts=False):
    schema = "doc_id long, text string" + (", ts long" if with_ts else "")
    return spark.createDataFrame(rows, schema)


def test_boilerplate_removed_first_kept(spark):
    banner = "ACCEPT COOKIES TO CONTINUE"
    rows = [(1, f"{banner}\nunique one"),
            (2, f"{banner}\nunique two"),
            (3, f"unique three\n{banner}")]
    out = {r["doc_id"]: r for r in
           line_dedup(_df(spark, rows)).collect()}
    assert out[1]["text"] == f"{banner}\nunique one"   # first occurrence
    assert out[2]["text"] == "unique two"
    assert out[3]["text"] == "unique three"
    assert out[1]["n_lines_dropped"] == 0
    assert out[2]["n_lines_dropped"] == 1
    assert out[3]["n_lines_dropped"] == 1


def test_no_shared_lines_roundtrips_byte_identical(spark):
    rows = [(1, "alpha\n\nbeta\n"),      # empty line + trailing sep
            (2, ""),                      # empty doc
            (3, "\n\n"),                  # only empty lines
            (4, "solo")]
    out = {r["doc_id"]: r["text"] for r in
           line_dedup(_df(spark, rows)).collect()}
    for i, t in rows:
        assert out[i] == t, (i, repr(out[i]), repr(t))


def test_empty_lines_bypass_dedup(spark):
    # empty lines repeat across docs but min_chars=1 exempts them
    rows = [(1, "a\n\nb"), (2, "c\n\nd")]
    out = {r["doc_id"]: r["text"] for r in
           line_dedup(_df(spark, rows)).collect()}
    assert out[1] == "a\n\nb" and out[2] == "c\n\nd"


def test_order_col_earliest_wins(spark):
    rows = [(10, "dup line\nten", 200), (20, "dup line\ntwenty", 100)]
    out = {r["doc_id"]: r["text"] for r in
           line_dedup(_df(spark, rows, with_ts=True),
                      order_col="ts").collect()}
    # doc 20 is EARLIER by ts, so it keeps the line despite the higher id
    assert out[20] == "dup line\ntwenty"
    assert out[10] == "ten"


def test_within_document_repeats_collapse(spark):
    rows = [(1, "x\nx\nx\ny")]
    [r] = line_dedup(_df(spark, rows)).collect()
    assert r["text"] == "x\ny"
    assert r["n_lines_kept"] == 2 and r["n_lines_dropped"] == 2


def test_null_text_stays_null_and_all_dropped_comes_back_empty(spark):
    rows = [(1, None), (2, "gone"), (3, "gone")]
    out = {r["doc_id"]: r for r in
           line_dedup(_df(spark, rows)).collect()}
    assert out[1]["text"] is None and out[1]["n_lines_kept"] == 0
    assert out[2]["text"] == "gone"
    assert out[3]["text"] == "" and out[3]["n_lines_dropped"] == 1


def test_custom_separator_and_min_chars(spark):
    rows = [(1, "aa|bb|cc"), (2, "bb|dd|aa")]
    out = {r["doc_id"]: r["text"] for r in
           line_dedup(_df(spark, rows), sep="|", min_chars=3).collect()}
    # every segment is < 3 chars -> nothing is dedupable
    assert out[1] == "aa|bb|cc" and out[2] == "bb|dd|aa"
    out2 = {r["doc_id"]: r["text"] for r in
            line_dedup(_df(spark, rows), sep="|", min_chars=1).collect()}
    assert out2[1] == "aa|bb|cc" and out2[2] == "dd"


def test_plan_no_python_and_two_exchanges(spark):
    df = _df(spark, [(1, "a\nb"), (2, "b\nc")])
    plan = (line_dedup(df)._jdf.queryExecution().executedPlan().toString())
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan
