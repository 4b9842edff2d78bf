"""Streaming sessionization (streaming/sessions.py): both strategies
close the same sessions as the batch closed form; cross-batch sessions
stitch instead of splitting; the open tail stays unemitted until the
watermark passes it (a far-future sentinel flushes in tests)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spandex_spark.streaming.sessions import sessionize_stream

SCHEMA = "event_id long, user_id long, ts timestamp"


def _write(d, name, rows, order=0):
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[2]) for r in rows]),
    })
    path = os.path.join(d, name)
    pq.write_table(t, path)
    # the file source processes oldest-mtime first; pin the order so the
    # watermark-flushing sentinel cannot overtake batch B and drop its
    # late events (a real flake seen when mtimes collided)
    os.utime(path, (1_700_000_000 + order, 1_700_000_000 + order))


def _run(spark, src, qname, **kw):
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType())])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = sessionize_stream(stream, gap_seconds=60,
                            watermark_delay="0 seconds", **kw)
    q = (out.writeStream.format("memory").queryName(qname)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return {(r.user_id, r.session_start.isoformat(),
             r.session_end.isoformat(), r.n_events)
            for r in spark.sql(f"select * from {qname}").collect()
            if r.user_id != 999}


# user 1: events at :00, :30, :35 (one session), then 05:00 (second)
# user 2: one event per batch 10s apart -> ONE stitched session
BATCH_A = [
    (0, 1, "2026-01-01T00:00:00"), (1, 1, "2026-01-01T00:00:30"),
    (2, 2, "2026-01-01T00:01:00"),
]
BATCH_B = [
    (3, 1, "2026-01-01T00:00:35"), (4, 2, "2026-01-01T00:01:10"),
    (5, 1, "2026-01-01T00:05:00"),
]
SENTINEL = [(99, 999, "2026-06-01T00:00:00")]   # flushes the watermark

WANT = {
    (1, "2026-01-01T00:00:00", "2026-01-01T00:00:35", 3),
    (1, "2026-01-01T00:05:00", "2026-01-01T00:05:00", 1),
    (2, "2026-01-01T00:01:00", "2026-01-01T00:01:10", 2),
}


def _want_builtin(gap=60):
    # session_window's end = last_event + gap (window semantics)
    import datetime as dt
    out = set()
    for u, s, e, n in WANT:
        e2 = (dt.datetime.fromisoformat(e)
              + dt.timedelta(seconds=gap)).isoformat()
        out.add((u, s, e2, n))
    return out


@pytest.mark.parametrize("strategy", ["builtin", "custom"])
def test_sessions_close_like_batch(spark, tmp_path, strategy):
    src = tmp_path / f"in_{strategy}"
    src.mkdir()
    _write(str(src), "a.parquet", BATCH_A, order=0)
    _write(str(src), "b.parquet", BATCH_B, order=60)
    _write(str(src), "z.parquet", SENTINEL, order=120)
    got = _run(spark, src, f"sess_{strategy}", strategy=strategy)
    if strategy == "custom":
        assert got == WANT          # end = last event (batch convention)
    else:
        assert got == _want_builtin()


def test_open_tail_not_emitted_without_watermark(spark, tmp_path):
    src = tmp_path / "in_tail"
    src.mkdir()
    _write(str(src), "a.parquet", BATCH_A)   # no sentinel: watermark
    got = _run(spark, src, "sess_tail", strategy="custom")
    # the sessions can't be proven closed yet -> nothing emitted
    assert got == set()


def test_bad_strategy(spark):
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError):
        sessionize_stream(df, ts_col="timestamp", by="value",
                          strategy="nope")
