"""Exact-substring span dedup (operators/dedup.py::substring_dedup):
planted shared passage removed everywhere but its first occurrence,
overlapping windows merge to maximal spans, short docs pass through,
within-doc repetition, NULL contract, and the no-Python plan shape."""

from pyspark.sql import functions as F

from spandex_spark.operators.dedup import substring_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _out(df):
    return {r.doc_id: r.text for r in df.collect()}


def test_shared_passage_first_occurrence_wins(spark):
    shared = " ".join(f"w{i}" for i in range(60))
    rows = [
        (1, f"alpha beta {shared} gamma"),
        (2, f"intro {shared} outro"),
        (3, "completely unrelated text " + " ".join(
            f"x{i}" for i in range(60))),
    ]
    got = _out(substring_dedup(_docs(spark, rows), k=50))
    assert got[1] == rows[0][1]                      # first occurrence kept
    assert got[2] == "intro outro"                   # span surgically removed
    assert got[3] == rows[2][1]                      # untouched
    # doc 2 keeps nothing of the shared words
    assert "w0" not in got[2] and "w59" not in got[2]


def test_overlapping_windows_merge_to_maximal_span(spark):
    # duplicated run of 70 tokens => windows at offsets 0..20 all dup;
    # union of [p, p+50) = [0, 70): the WHOLE run goes, nothing else
    run = " ".join(f"t{i}" for i in range(70))
    rows = [(1, f"{run}"), (2, f"left {run} right")]
    got = _out(substring_dedup(_docs(spark, rows), k=50))
    assert got[1] == run
    assert got[2] == "left right"


def test_short_docs_pass_through_canonicalized(spark):
    rows = [(1, "only   a few    tokens"), (2, None)]
    got = _out(substring_dedup(_docs(spark, rows), k=50))
    assert got[1] == "only a few tokens"   # single-space canonicalization
    assert got[2] is None


def test_within_doc_repetition(spark):
    run = " ".join(f"r{i}" for i in range(50))
    rows = [(1, f"{run} mid {run}")]
    got = _out(substring_dedup(_docs(spark, rows), k=50))
    # second in-document copy is the non-canonical occurrence
    assert got[1] == f"{run} mid"


def test_tie_break_is_doc_id_then_pos(spark):
    shared = " ".join(f"s{i}" for i in range(50))
    rows = [(7, f"{shared} tail7"), (3, f"{shared} tail3")]
    got = _out(substring_dedup(_docs(spark, rows), k=50))
    assert got[3] == f"{shared} tail3"     # smaller doc_id wins
    assert got[7] == "tail7"


def test_no_python_in_plan(spark):
    df = _docs(spark, [(1, "a b c"), (2, "d e f")])
    out = substring_dedup(df, k=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for op in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
               "FlatMapGroupsInPandas"):
        assert op not in plan


def test_canonical_span_protected_from_overlapping_losers(spark):
    # 'a b' first in doc1; 'b c' first in doc2.  doc2's loser span
    # [0,2) for 'a b' overlaps its OWN canonical window [1,3) for
    # 'b c' — the canonical tokens must survive or 'b c' would be
    # erased corpus-wide (the cascade case)
    rows = [(1, "a b"), (2, "a b c"), (3, "x b c")]
    got = _out(substring_dedup(_docs(spark, rows), k=2))
    assert got[1] == "a b"
    assert got[2] == "b c"      # 'a' removed; canonical 'b c' kept
    assert got[3] == "x"        # loser of 'b c'
