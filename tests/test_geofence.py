"""Streaming geofence transitions (streaming/geofence.py): cross-batch
state, first-sighting enter, late-data drop, batch-twin parity on a
random walk, and the TTL exit-to-outside path."""

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from spandex_spark.streaming.geofence import (zone_transitions,
                                              zone_transitions_batch)

_SCHEMA = "user_id string, ts timestamp, zone_id long"


def _write(d, name, rows):
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows]),
        "ts": pa.array([np.datetime64(r[1]) for r in rows]),
        "zone_id": pa.array([r[2] for r in rows], pa.int64()),
    })
    pq.write_table(t, os.path.join(d, name))


def _run_stream(spark, src, qname, **kw):
    stream = (spark.readStream.schema(_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = zone_transitions(stream, **kw)
    q = (out.writeStream.format("memory").queryName(qname)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"select * from {qname}")


def _tuples(df):
    return {(r.entity, str(r.ts), r.from_zone, r.to_zone)
            for r in df.collect()}


def test_cross_batch_transitions_and_late_drop(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write(str(src), "a.parquet", [
        ("u1", "2026-01-01T00:00:00", 5),     # first sighting: NULL -> 5
        ("u1", "2026-01-01T00:01:00", 5),     # no change
        ("u2", "2026-01-01T00:00:30", 7),
    ])
    time.sleep(1.1)   # distinct modTime: file-source order is modTime-based
    _write(str(src), "b.parquet", [
        ("u1", "2026-01-01T00:02:00", 9),     # cross-batch 5 -> 9
        ("u1", "2026-01-01T00:00:30", 1),     # LATE (before state ts): drop
        ("u2", "2026-01-01T00:03:00", 7),     # no change
    ])
    got = _tuples(_run_stream(spark, src, "gf1"))
    assert got == {
        ("u1", "2026-01-01 00:00:00", None, 5),
        ("u1", "2026-01-01 00:02:00", 5, 9),
        ("u2", "2026-01-01 00:00:30", None, 7),
    }


def test_batch_twin_parity_random_walk(spark, tmp_path):
    rng = np.random.default_rng(31)
    src = tmp_path / "walk"
    src.mkdir()
    rows = []
    for u in range(12):
        n = int(rng.integers(5, 25))
        ts = np.sort(rng.choice(86400, size=n, replace=False))
        zones = rng.integers(0, 4, size=n)
        rows += [(f"u{u}", f"2026-02-01T{int(t)//3600:02d}:"
                  f"{int(t)%3600//60:02d}:{int(t)%60:02d}", int(z))
                 for t, z in zip(ts, zones)]
    rng.shuffle(rows)
    third = len(rows) // 3
    _write(str(src), "a.parquet", rows[:third])
    time.sleep(1.1)
    _write(str(src), "b.parquet", rows[third:2 * third])
    time.sleep(1.1)
    _write(str(src), "c.parquet", rows[2 * third:])
    got = _tuples(_run_stream(spark, src, "gf2"))
    import datetime
    batch = spark.createDataFrame(
        [(u, datetime.datetime.fromisoformat(t), z) for u, t, z in rows],
        _SCHEMA)
    expect = _tuples(zone_transitions_batch(batch))
    # the stream drops cross-batch late rows; with per-user unique ts
    # randomly split across 3 files, late rows exist — the batch twin
    # sees them all, so parity is asserted on the SORTED replay instead
    src2 = tmp_path / "walk_sorted"
    src2.mkdir()
    rows_sorted = sorted(rows, key=lambda r: r[1])
    _write(str(src2), "a.parquet", rows_sorted[:third])
    time.sleep(1.1)
    _write(str(src2), "b.parquet", rows_sorted[third:2 * third])
    time.sleep(1.1)
    _write(str(src2), "c.parquet", rows_sorted[2 * third:])
    got_sorted = _tuples(_run_stream(spark, src2, "gf3"))
    assert got_sorted == expect
    # the unsorted run drops late rows, which legitimately rewrites later
    # from_zones — exact parity is only owed on in-order input. Invariants
    # that DO hold under loss: per entity, exactly one first-sighting
    # (from_zone None) and it is the earliest emitted row; and every
    # emitted transition actually changes zone.
    for u in {t[0] for t in got}:
        mine = sorted(t for t in got if t[0] == u)
        firsts = [t for t in mine if t[2] is None]
        assert len(firsts) == 1 and firsts[0][1] == mine[0][1]
    assert all(t[2] != t[3] for t in got)


def test_ttl_emits_exit_and_reenter(spark, tmp_path):
    src = tmp_path / "ttl"
    src.mkdir()
    stream = (spark.readStream.schema(_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = zone_transitions(stream, exit_after_minutes=0.02)  # 1.2 s
    q = (out.writeStream.format("memory").queryName("gf_ttl")
         .outputMode("append").trigger(processingTime="500 milliseconds")
         .start())
    try:
        _write(str(src), "a.parquet", [("u1", "2026-03-01T00:00:00", 3)])
        deadline = time.time() + 60
        while time.time() < deadline:
            if ("u1", "2026-03-01 00:00:00", None, 3) in \
                    _tuples(spark.sql("select * from gf_ttl")):
                break
            time.sleep(0.5)
        # timeouts only fire when a batch executes (file source runs no
        # empty batches): wait past the TTL, then kick with unrelated rows
        time.sleep(2.0)
        kick = 0
        deadline = time.time() + 90
        while time.time() < deadline:
            rows = _tuples(spark.sql("select * from gf_ttl"))
            if ("u1", "2026-03-01 00:00:00", 3, None) in rows:
                break
            _write(str(src), f"kick{kick}.parquet",
                   [("kicker", f"2026-03-01T00:10:{kick:02d}", 1)])
            kick += 1
            time.sleep(1.0)
        rows = _tuples(spark.sql("select * from gf_ttl"))
        assert ("u1", "2026-03-01 00:00:00", None, 3) in rows
        assert ("u1", "2026-03-01 00:00:00", 3, None) in rows  # TTL exit
        # re-entry after eviction is a fresh NULL -> zone enter
        _write(str(src), "b.parquet", [("u1", "2026-03-01T01:00:00", 4)])
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = _tuples(spark.sql("select * from gf_ttl"))
            if ("u1", "2026-03-01 01:00:00", None, 4) in rows:
                break
            time.sleep(0.5)
        assert ("u1", "2026-03-01 01:00:00", None, 4) in rows
    finally:
        q.stop()
