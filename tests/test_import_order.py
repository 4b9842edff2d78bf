"""Regression tests for the round-3 package-attr shadowing bug.

``operators/__init__.py`` rebinds package attributes (e.g. the name
``trim``) from the *submodule* to the *function* of the same name.  Any
sibling module doing ``from spandex_spark.operators import trim`` then
receives the function — and breaks lazily, at call time, only after the
package root has been imported (exactly how ``clip_lines`` shipped broken
in round 3: VERDICT.md "What's wrong #1").

Two layers of defence:

1. A static lint: no source file may use the ambiguous
   ``from spandex_spark.operators import <name>`` form for a name that
   ``operators/__init__.py`` also rebinds.  Submodules must be imported by
   their full dotted path (``from spandex_spark.operators.trim import ...``).
2. A dynamic smoke: import the package root FIRST (running every rebind in
   ``__init__``), then exercise the previously-broken call path on a tiny
   frame.
"""

import ast
import glob
import os

import numpy as np
import pytest

# Import the package roots BEFORE any submodule, so every __init__ rebind
# has happened by the time the smoke calls below run.
import spandex_spark  # noqa: F401
import spandex_spark.operators as ops

PKG_DIR = os.path.join(os.path.dirname(__file__), "..", "spandex_spark")


def _rebound_names():
    """Names that operators/__init__.py binds on the package object."""
    src = open(os.path.join(PKG_DIR, "operators", "__init__.py")).read()
    names = set()
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.ImportFrom):
            for a in node.names:
                names.add(a.asname or a.name)
    return names


def test_no_ambiguous_operator_imports():
    rebound = _rebound_names()
    offenders = []
    for path in glob.glob(os.path.join(PKG_DIR, "**", "*.py"), recursive=True):
        if path.endswith(os.path.join("operators", "__init__.py")):
            continue
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if (isinstance(node, ast.ImportFrom)
                    and node.module == "spandex_spark.operators"):
                for a in node.names:
                    if a.name in rebound:
                        offenders.append(
                            f"{os.path.relpath(path, PKG_DIR)}:{node.lineno}"
                            f" imports ambiguous name '{a.name}' from the"
                            " operators package (shadowed by __init__);"
                            " import the submodule by full dotted path")
    assert not offenders, "\n".join(offenders)


LINE_SCHEMA = (
    "line_id long, geom struct<kind:tinyint, xs:array<double>,"
    " ys:array<double>, ring_offsets:array<int>,"
    " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def _line_row(lid, a, b):
    return (lid, {
        "kind": 2, "xs": [float(a[0]), float(b[0])],
        "ys": [float(a[1]), float(b[1])], "ring_offsets": [0, 2],
        "bbox": {"minx": float(min(a[0], b[0])),
                 "miny": float(min(a[1], b[1])),
                 "maxx": float(max(a[0], b[0])),
                 "maxy": float(max(a[1], b[1]))}})


def test_clip_lines_runs_after_package_root_import(spark):
    """The exact round-3 failure: package root imported first, then
    clip_lines called — must not AttributeError and must clip correctly."""
    rows = [_line_row(0, (-1.0, 0.5), (3.0, 0.5)),   # crosses the unit box
            _line_row(1, (5.0, 5.0), (6.0, 5.0)),    # fully outside
            _line_row(2, (0.25, 0.25), (0.75, 0.25))]  # fully inside
    df = spark.createDataFrame(rows, LINE_SCHEMA)
    bx = np.array([0.0, 1.0, 1.0, 0.0])
    by = np.array([0.0, 0.0, 1.0, 1.0])
    got = {r.line_id: r.clip_len_deg for r in ops.clip_lines(df, bx, by).collect()}
    assert got.get(0, 0.0) == pytest.approx(1.0, abs=1e-9)
    assert got.get(1, 0.0) == pytest.approx(0.0, abs=1e-9)
    assert got.get(2, 0.0) == pytest.approx(0.5, abs=1e-9)


def test_exported_geometry_operators_callable(spark):
    """Call the other __init__-exported geometry entry points on 3-row
    frames — any future export refactor that breaks a call path fails here,
    in-suite, rather than in the driver's correctness gate."""
    pts = spark.createDataFrame(
        [(0, 0.5, 0.5), (1, 2.5, 0.5), (2, 0.5, 2.5)],
        "pid long, lon double, lat double")
    polys = spark.createDataFrame(
        [(10, {"kind": 3, "xs": [0.0, 1.0, 1.0, 0.0],
               "ys": [0.0, 0.0, 1.0, 1.0], "ring_offsets": [0, 4],
               "bbox": {"minx": 0.0, "miny": 0.0, "maxx": 1.0, "maxy": 1.0}})],
        "zone_id long, geom struct<kind:tinyint, xs:array<double>,"
        " ys:array<double>, ring_offsets:array<int>,"
        " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
    tagged = ops.tag_points(pts, polys, poly_id_col="zone_id",
                            point_id_col="pid").collect()
    assert {r.pid: r.zone_id for r in tagged}[0] == 10

    lined = spark.createDataFrame(
        [_line_row(7, (0.0, 0.0), (3.0, 4.0))], LINE_SCHEMA)
    ll = ops.line_length(lined).collect()
    assert ll[0].length == pytest.approx(5.0)
