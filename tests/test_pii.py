"""PII scrubbing (operators/pii.py): closed-form planted spans,
rule-order/idempotency invariants, DuckDB same-pattern parity (the
future oracle contract), and the zero-Python plan check."""

import duckdb
import os
import pytest

from spandex_spark.operators.pii import PII_RULES, pii_stats, scrub_pii

CASES = [
    # (raw, scrubbed)
    ("mail me at jane.doe+spam@sub.example.co.uk today",
     "mail me at <EMAIL> today"),
    ("server at 192.168.0.255 and 8.8.8.8 up",
     "server at <IP> and <IP> up"),
    ("not an ip 999.999.999.999 nor 1.2.3.4567",
     "not an ip 999.999.999.999 nor 1.2.3.4567"),
    ("ssn 123-45-6789 leaked", "ssn <SSN> leaked"),
    ("call (415) 555-0123 or +1 415.555.0123 or 415-555-0123",
     "call <PHONE> or <PHONE> or <PHONE>"),
    # bare 10-digit run is an id, not a phone
    ("order 4155550123 shipped", "order 4155550123 shipped"),
    ("mixed: a@b.io, 10.0.0.1, 987-65-4321, (212) 555-9876.",
     "mixed: <EMAIL>, <IP>, <SSN>, <PHONE>."),
    ("clean text stays byte-identical", "clean text stays byte-identical"),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "id long, text string")


def test_planted_spans(spark):
    got = {r["id"]: r["text"]
           for r in scrub_pii(_df(spark)).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}"


def test_idempotent_and_out_col(spark):
    once = scrub_pii(_df(spark), out_col="clean")
    twice = scrub_pii(once, text_col="clean", out_col="clean2")
    for r in twice.collect():
        assert r["clean2"] == r["clean"]
        assert r["text"] == CASES[r["id"]][0]  # original untouched


def test_stats_counts(spark):
    rows = {r["id"]: r for r in pii_stats(_df(spark)).collect()}
    assert (rows[0]["n_email"], rows[0]["n_pii"]) == (1, 1)
    assert (rows[1]["n_ipv4"], rows[1]["n_pii"]) == (2, 2)
    assert rows[2]["n_pii"] == 0
    assert (rows[4]["n_phone"], rows[4]["n_pii"]) == (3, 3)
    assert rows[6]["n_pii"] == 4
    assert rows[7]["n_pii"] == 0


def test_unknown_rule_rejected(spark):
    with pytest.raises(ValueError, match="unknown PII rule"):
        scrub_pii(_df(spark), kinds=("email", "iban"))


def test_duckdb_same_pattern_parity(spark, fixture_dir):
    """The Java∩RE2 subset contract: DuckDB running the IDENTICAL
    patterns produces the identical scrub, on the planted cases AND
    the fixture pages corpus."""
    con = duckdb.connect()
    expr = "text"
    for _, pat, rep in PII_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"

    for df, src in [
            (_df(spark), "planted"),
            (spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
             .select("url", "text").limit(200), "pages")]:
        pdf = df.toPandas()
        oracle = con.execute(
            f"SELECT {expr} AS text FROM pdf ORDER BY 1").fetchall()
        key = df.columns[0]
        got = sorted(r["text"] for r in
                     scrub_pii(df, text_col="text").select("text").collect())
        assert got == [r[0] for r in oracle], src


def test_zero_python_plan(spark):
    plan = (pii_stats(scrub_pii(_df(spark)))
            ._jdf.queryExecution().executedPlan().toString())
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "*(1) Project" in plan  # * prefix = whole-stage codegen
