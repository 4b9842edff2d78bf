"""Sessionization (operators/timeseries.py::sessionize/session_stats):
hand-worked gap splits, exact-gap boundary, microsecond precision,
partitioning independence, and DuckDB window-idiom parity on the events
fixture (the future oracle contract)."""

import datetime as dt
import os

import duckdb

from spandex_spark.operators.timeseries import session_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _df(spark, offsets_s, users=None):
    users = users or [1] * len(offsets_s)
    rows = [(i, u, T0 + dt.timedelta(seconds=s))
            for i, (u, s) in enumerate(zip(users, offsets_s))]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_hand_worked_sessions(spark):
    # gaps: 10s, 40s(new), 10s, 3600s(new) with gap=30
    df = _df(spark, [0, 10, 50, 60, 3660])
    got = {r["event_id"]: (r["session_seq"], r["session_id"])
           for r in sessionize(df, gap_seconds=30,
                               order_cols=("event_id",)).collect()}
    assert got == {0: (1, "1-1"), 1: (1, "1-1"), 2: (2, "1-2"),
                   3: (2, "1-2"), 4: (3, "1-3")}


def test_exact_gap_is_same_session(spark):
    # delta == gap stays in-session; strictly greater splits
    df = _df(spark, [0, 30, 60.000001])
    got = sorted(r["session_seq"] for r in
                 sessionize(df, gap_seconds=30).collect())
    assert got == [1, 1, 2]


def test_keys_are_independent(spark):
    df = _df(spark, [0, 10, 0, 3600], users=[1, 1, 2, 2])
    rows = sessionize(df, gap_seconds=30).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["session_seq"])
    assert sorted(by_user[1]) == [1, 1]
    assert sorted(by_user[2]) == [1, 2]


def test_partitioning_independent(spark):
    df = _df(spark, [i * 25 for i in range(40)],
             users=[i % 3 for i in range(40)])
    a = {r["event_id"]: r["session_id"]
         for r in sessionize(df, gap_seconds=60).collect()}
    b = {r["event_id"]: r["session_id"]
         for r in sessionize(df.repartition(7), gap_seconds=60).collect()}
    assert a == b


def test_session_stats_closed_form(spark):
    df = _df(spark, [0, 10, 50, 3650], users=[1, 1, 1, 1])
    rows = {r["session_id"]: r for r in
            session_stats(df, gap_seconds=30).collect()}
    assert set(rows) == {"1-1", "1-2", "1-3"}
    assert rows["1-1"]["n_events"] == 2
    assert rows["1-1"]["duration_us"] == 10_000_000
    assert rows["1-2"]["n_events"] == 1 and rows["1-2"]["duration_us"] == 0
    assert rows["1-3"]["session_start"] == T0 + dt.timedelta(seconds=3650)


def test_duckdb_parity_on_events(spark):
    path = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    path = os.path.join(path, "events.parquet")
    if not os.path.exists(path):
        import pytest
        pytest.skip("driver testdata not present")
    ev = spark.read.parquet(path)
    got = {(r["event_id"]): r["session_id"]
           for r in sessionize(ev, gap_seconds=900,
                               order_cols=("event_id",)).collect()}
    want = duckdb.sql(f"""
        WITH lagged AS (
          SELECT event_id, user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_ts
          FROM read_parquet('{path}')
        ), flagged AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN prev_ts IS NULL
                           OR epoch_us(ts) - epoch_us(prev_ts) > 900000000
                      THEN 1 ELSE 0 END AS is_new
          FROM lagged
        )
        SELECT event_id,
               user_id || '-' || CAST(sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS session_id
        FROM flagged
    """).fetchall()
    assert len(want) == len(got) > 0
    for eid, sid in want:
        assert got[eid] == sid
