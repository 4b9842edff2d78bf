"""Trajectories (operators/trajectory.py): make_line ordering +
SoA-struct shape, trip_stats closed forms, Li stay-point scan against
planted dwells, partitioning invariance, single-Exchange plan."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.geom import EARTH_RADIUS_M
from spandex_spark.operators.trajectory import (
    make_line, stay_points, trip_stats)


def _ts(minute, second=0):
    return (dt.datetime(2026, 3, 1, 12, 0, 0)
            + dt.timedelta(minutes=minute, seconds=second))


@pytest.fixture(scope="module")
def tracks(spark):
    rows = []
    # user 1: straight eastward walk along the equator, 1 pt/min
    for m in range(10):
        rows.append((1, _ts(m), 0.001 * m, 0.0))
    # user 2: dwell at (5, 5) for 30 min, walk, dwell at (5.1, 5)
    for m in range(6):
        rows.append((2, _ts(m * 6), 5.0 + 1e-5 * m, 5.0))
    rows.append((2, _ts(40), 5.05, 5.0))
    for m in range(5):
        rows.append((2, _ts(44 + m * 4), 5.1, 5.0 + 1e-5 * m))
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, lon double, lat double")


def test_make_line_orders_by_ts(spark, tracks):
    got = {r["user_id"]: r for r in
           make_line(tracks.repartition(7), group_col="user_id")
           .collect()}
    g1 = got[1]["geom"]
    assert g1["kind"] == 2
    assert g1["xs"] == pytest.approx([0.001 * m for m in range(10)])
    assert g1["ys"] == [0.0] * 10
    assert list(g1["ring_offsets"]) == [0, 10]
    assert g1["bbox"]["maxx"] == pytest.approx(0.009)
    assert got[1]["n_points"] == 10
    # shuffled input produces the identical line (determinism)
    again = make_line(tracks.orderBy(F.rand(4)), group_col="user_id") \
        .collect()
    assert {r["user_id"]: r["geom"]["xs"] for r in again}[1] == g1["xs"]


def test_trip_stats_closed_form(spark, tracks):
    got = {r["user_id"]: r for r in
           trip_stats(tracks, group_col="user_id").collect()}
    r1 = got[1]
    assert r1["n_points"] == 10
    assert r1["duration_s"] == pytest.approx(9 * 60)
    # 9 equatorial steps of 0.001 degree
    step = math_step = EARTH_RADIUS_M * np.radians(0.001)
    assert r1["length_m"] == pytest.approx(9 * step, rel=1e-9)
    assert r1["avg_speed_ms"] == pytest.approx(9 * step / 540, rel=1e-9)
    assert r1["max_gap_s"] == pytest.approx(60.0)


def test_single_point_group(spark):
    df = spark.createDataFrame([(9, _ts(0), 1.0, 2.0)],
                               "user_id long, ts timestamp, "
                               "lon double, lat double")
    r = trip_stats(df, group_col="user_id").collect()[0]
    assert r["length_m"] == 0.0 and r["avg_speed_ms"] is None
    assert r["max_gap_s"] is None
    line = make_line(df, group_col="user_id").collect()[0]
    assert line["n_points"] == 1 and line["geom"]["xs"] == [1.0]


def test_stay_points_planted_dwells(spark, tracks):
    got = stay_points(tracks, group_col="user_id", radius_m=200.0,
                      min_duration_s=15 * 60).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1 never dwells 15 min within 200 m (moves ~111 m/min)
    assert 1 not in by_user
    stays = sorted(by_user[2], key=lambda r: r["stay_id"])
    assert len(stays) == 2
    s0, s1 = stays
    assert s0["lon"] == pytest.approx(5.0, abs=1e-3)
    assert (s0["depart_ts"] - s0["arrive_ts"]).total_seconds() == 30 * 60
    assert s0["n_points"] == 6
    assert s1["lon"] == pytest.approx(5.1, abs=1e-3)
    assert s1["n_points"] == 5


def test_stay_points_partitioning_invariance(spark, tracks):
    a = sorted(map(tuple, stay_points(
        tracks.repartition(11), group_col="user_id", radius_m=200.0,
        min_duration_s=900).collect()))
    b = sorted(map(tuple, stay_points(
        tracks.coalesce(1), group_col="user_id", radius_m=200.0,
        min_duration_s=900).collect()))
    assert a == b


def test_trip_stats_single_exchange(spark, tracks):
    plan = trip_stats(tracks, group_col="user_id") \
        ._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1   # window + groupBy share it
    assert "ArrowEvalPython" not in final and "BatchEvalPython" not in final


def test_od_matrix(spark):
    rows = [
        (1, _ts(0), "A"), (1, _ts(1), "A"), (1, _ts(2), "B"),
        (1, _ts(3), None), (1, _ts(4), "C"),          # NULL breaks chain
        (2, _ts(0), "B"), (2, _ts(1), "A"), (2, _ts(2), "B"),
    ]
    df = spark.createDataFrame(rows,
                               "user_id long, ts timestamp, zone string")
    from spandex_spark.operators.trajectory import od_matrix
    got = {(r["origin"], r["destination"]): r["n"]
           for r in od_matrix(df, group_col="user_id",
                              loc_col="zone").collect()}
    assert got == {("A", "B"): 2, ("B", "A"): 1}
    with_self = {(r["origin"], r["destination"]): r["n"]
                 for r in od_matrix(df, group_col="user_id",
                                    loc_col="zone",
                                    include_self=True).collect()}
    assert with_self[("A", "A")] == 1
