"""Icebergish MERGE (tables.py::merge): upsert/update/delete semantics,
file-level pruning, time travel, and the source-cardinality rule."""

import pytest
from pyspark.sql import functions as F

from spandex_spark.tables import IcebergishTable


def _mk(spark, tmp_path, rows, name="t"):
    t = IcebergishTable(str(tmp_path / name))
    t.append(spark.createDataFrame(rows, "k long, v string"))
    return t


def _state(t, spark):
    return {r["k"]: r["v"] for r in t.read(spark).collect()}


def test_upsert_updates_and_inserts(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    res = t.merge(spark, spark.createDataFrame(
        [(2, "B"), (4, "d")], "k long, v string"), "k")
    assert res["matched"] == 1 and res["inserted"] == 1
    assert _state(t, spark) == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_update_never_inserts(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
    res = t.merge(spark, spark.createDataFrame(
        [(2, "B"), (9, "z")], "k long, v string"), "k", mode="update")
    assert res["matched"] == 1 and res["inserted"] == 0
    assert _state(t, spark) == {1: "a", 2: "B"}


def test_delete_mode(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    res = t.merge(spark, spark.createDataFrame(
        [(2, "ignored"), (9, "no-match")], "k long, v string"),
        "k", mode="delete")
    assert res["deleted"] == 1 == res["matched"]
    assert _state(t, spark) == {1: "a", 3: "c"}


def test_file_pruning_carries_disjoint_files(spark, tmp_path):
    t = IcebergishTable(str(tmp_path / "p"))
    t.append(spark.createDataFrame([(i, "lo") for i in range(10)],
                                   "k long, v string").coalesce(1))
    t.append(spark.createDataFrame([(i, "hi") for i in range(100, 110)],
                                   "k long, v string").coalesce(1))
    res = t.merge(spark, spark.createDataFrame(
        [(105, "HI"), (120, "new")], "k long, v string"), "k")
    # the k<10 file's [0,9] range misses [105,120]: carried, not rewritten
    assert res["carried"] == 1 and res["rewritten"] == 1
    assert res["matched"] == 1 and res["inserted"] == 1
    st = _state(t, spark)
    assert st[105] == "HI" and st[120] == "new" and st[0] == "lo"
    assert len(st) == 21


def test_no_overlap_upsert_is_pure_insert(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    res = t.merge(spark, spark.createDataFrame(
        [(100, "x")], "k long, v string"), "k")
    assert res == {"matched": 0, "inserted": 1, "deleted": 0,
                   "rewritten": 0, "carried": 1}
    assert _state(t, spark) == {1: "a", 100: "x"}


def test_update_with_no_match_publishes_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    seq_before = t.current_snapshot()["sequence"]
    res = t.merge(spark, spark.createDataFrame(
        [(100, "x")], "k long, v string"), "k", mode="update")
    assert res["rewritten"] == 0 and res["matched"] == 0
    assert t.current_snapshot()["sequence"] == seq_before


def test_time_travel_sees_pre_merge_state(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
    seq0 = t.current_snapshot()["sequence"]
    t.merge(spark, spark.createDataFrame([(2, "B")], "k long, v string"), "k")
    old = {r["k"]: r["v"]
           for r in t.read(spark, as_of_seq=seq0).collect()}
    assert old == {1: "a", 2: "b"}
    assert _state(t, spark) == {1: "a", 2: "B"}


def test_duplicate_source_keys_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge(spark, spark.createDataFrame(
            [(1, "x"), (1, "y")], "k long, v string"), "k")


def test_composite_keys(spark, tmp_path):
    t = IcebergishTable(str(tmp_path / "c"))
    t.append(spark.createDataFrame(
        [(1, "x", "a"), (1, "y", "b"), (2, "x", "c")],
        "k long, sub string, v string"))
    res = t.merge(spark, spark.createDataFrame(
        [(1, "y", "B"), (2, "y", "d")], "k long, sub string, v string"),
        ["k", "sub"])
    assert res["matched"] == 1 and res["inserted"] == 1
    got = {(r["k"], r["sub"]): r["v"] for r in t.read(spark).collect()}
    assert got == {(1, "x"): "a", (1, "y"): "B", (2, "x"): "c",
                   (2, "y"): "d"}


def test_update_range_overlap_but_no_match_publishes_nothing(spark, tmp_path):
    """Key RANGE overlaps a live file but no key matches: update must
    not rewrite byte-identical files (review finding)."""
    t = _mk(spark, tmp_path, [(1, "a"), (9, "z")])
    seq_before = t.current_snapshot()["sequence"]
    res = t.merge(spark, spark.createDataFrame(
        [(5, "x")], "k long, v string"), "k", mode="update")
    assert res["rewritten"] == 0 and res["matched"] == 0
    assert t.current_snapshot()["sequence"] == seq_before


def test_duplicate_target_keys_counted_exactly(spark, tmp_path):
    """Two target rows share a key (two appends): delete removes both
    and reports 2; upsert replaces both with THE source row (keyed
    output, documented) and reports matched=2."""
    t = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
    t.append(spark.createDataFrame([(2, "b2")], "k long, v string"))
    res = t.merge(spark, spark.createDataFrame(
        [(2, "B")], "k long, v string"), "k")
    assert res["matched"] == 2 and res["inserted"] == 0
    assert _state(t, spark) == {1: "a", 2: "B"}

    t2 = _mk(spark, tmp_path, [(1, "a"), (2, "b")], name="t2")
    t2.append(spark.createDataFrame([(2, "b2")], "k long, v string"))
    res = t2.merge(spark, spark.createDataFrame(
        [(2, "x")], "k long, v string"), "k", mode="delete")
    assert res["deleted"] == 2 == res["matched"]
    assert _state(t2, spark) == {1: "a"}
