"""C4 cleaning heuristics (operators/textstats.py::c4_clean): line
rules (terminal punctuation, min words, javascript), page rules
(sentence floor, lorem ipsum, curly brace, blocklist), NULL contract,
and the map-only plan shape."""

from pyspark.sql import functions as F

from spandex_spark.operators.textstats import c4_clean


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = ("This is the first proper sentence of the page.\n"
        "Here is another sentence with enough words in it.\n"
        "And a third one closes the page out nicely.")


def test_line_rules(spark):
    text = ("Short line.\n"                       # < 5 words: dropped
            "This line has plenty of words but no terminal mark\n"
            "Enable javascript to view this page properly.\n"  # dropped
            + GOOD)
    got = c4_clean(_docs(spark, [(1, text)])).collect()[0]
    assert got.clean_text == GOOD
    assert got.c4_pass


def test_page_rules(spark):
    rows = [(1, GOOD),
            (2, "Only one full sentence lives on this page."),
            (3, GOOD + "\nSome lorem ipsum filler text sits here too."),
            (4, GOOD + "\nfunction f() {"),   # code line: no terminal punct
            (5, None)]
    got = {r.doc_id: r for r in c4_clean(_docs(spark, rows)).collect()}
    assert got[1].c4_pass
    assert not got[2].c4_sentences and not got[2].c4_pass
    assert not got[3].c4_no_lorem and not got[3].c4_pass
    # the brace line ends in '{' so the LINE rule already drops it;
    # page 4 still passes because the cleaned text has no brace left
    assert got[4].c4_no_brace
    assert got[5].clean_text is None and not got[5].c4_pass


def test_brace_inside_kept_line_fails_page(spark):
    text = GOOD.replace("another sentence", "another {code} sentence")
    got = c4_clean(_docs(spark, [(1, text)])).collect()[0]
    assert not got.c4_no_brace and not got.c4_pass


def test_blocklist(spark):
    got = {r.doc_id: r for r in c4_clean(
        _docs(spark, [(1, GOOD), (2, GOOD.replace("third", "badword"))]),
        blocklist=["badword"]).collect()}
    assert got[1].c4_pass
    assert not got[2].c4_no_blockword and not got[2].c4_pass


def test_map_only_plan(spark):
    out = c4_clean(_docs(spark, [(1, GOOD)]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    for op in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
               "Exchange"):
        assert op not in plan
