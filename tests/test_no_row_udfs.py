"""Design-rule enforcement (SURVEY.md §2.3 / BASELINE.json:15): no per-row
Python UDFs anywhere in the package — only Arrow-vectorized pandas UDFs
(pandas_udf / applyInPandas / mapInPandas) are allowed Python crossings."""

import os
import re

PKG = os.path.join(os.path.dirname(__file__), "..", "spandex_spark")


def test_no_row_at_a_time_udfs():
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            src = open(os.path.join(root, fn)).read()
            # the row-at-a-time API is F.udf(...) / @udf — pandas_udf is fine
            if re.search(r"(?<!pandas_)\budf\s*\(", src.replace("pandas_udf", "")):
                if re.search(r"\bF\.udf\s*\(|^\s*@udf\b|from pyspark.sql.functions import udf\b",
                             src, re.M):
                    offenders.append(fn)
    assert not offenders, f"row-at-a-time UDFs found in {offenders}"


def test_every_collect_site_is_marked():
    """Driver-side loops over collect() mean an operator isn't distributed.

    Enforcement is per CALL SITE, not per file: every ``.collect()`` /
    ``.toPandas()`` line anywhere in the package must carry an inline
    ``# collect-ok: <reason>`` marker stating why it is bounded (tiny
    aggregate, broadcast-by-contract layer, O(occupied-cells) histogram,
    metadata probe).  An unmarked collect fails here no matter which file
    it lands in — a whole-file allowlist let unjustified sites hide behind
    a justified neighbour (round-3 VERDICT 'What's wrong #3')."""
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            for i, line in enumerate(open(path), start=1):
                if ((".collect()" in line or ".toPandas()" in line)
                        and "# collect-ok:" not in line):
                    rel = os.path.relpath(path, PKG)
                    offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, (
        "unmarked driver-side collect sites (add '# collect-ok: <reason>' "
        "only if genuinely bounded):\n" + "\n".join(offenders))
