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


def test_no_collect_in_operators():
    """Driver-side loops over collect() mean an operator isn't distributed.
    Allowed: the skew planner's hot-cell list (tiny aggregate by design) and
    the ANN query-side matrix (broadcast-sized by contract — the corpus side
    streams via mapInPandas)."""
    allowed = {"skew.py", "similarity.py", "tag.py", "knn.py", "lines.py",
               "dedup.py", "zonal.py"}
    # skew: hot-cell list (tiny aggregate); similarity/knn: query/feature
    # side collected when broadcast-sized by contract; tag: polygon rings
    # captured by closure in the broadcast path (one copy per executor);
    # lines: the line layer, broadcast-sized by contract (road networks);
    # dedup: duplicate_clusters' convergence check — a 1-row sum aggregate
    # per round, never data rows; zonal: raster_sample's limit(1) tile
    # metadata probe (res/nx/ny of the regular tiling) — one row, once.
    offenders = []
    ops = os.path.join(PKG, "operators")
    for fn in os.listdir(ops):
        if fn.endswith(".py") and fn not in allowed:
            src = open(os.path.join(ops, fn)).read()
            if ".collect()" in src or ".toPandas()" in src:
                offenders.append(fn)
    assert not offenders, f"driver-side collect in operators: {offenders}"
