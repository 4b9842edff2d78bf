"""applyInPandasWithState first-seen dedup: duplicate urls across files
collapse to their earliest row."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import numpy as np

from spandex_spark.streaming.stateful import dedup_first_seen
from spandex_spark.streaming.ingest import PAGES_SCHEMA


def _write_batch(d, name, rows):
    t = pa.table({
        "url": pa.array([r[0] for r in rows]),
        "warc_ts": pa.array([np.datetime64(r[1]) for r in rows]),
        "html": pa.array([b"<html>"] * len(rows), pa.binary()),
        "text": pa.array([r[2] for r in rows]),
        "lang": pa.array(["en"] * len(rows)),
    })
    pq.write_table(t, os.path.join(d, name))


def test_first_seen_dedup(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(str(src), "a.parquet", [
        ("u1", "2026-01-01T00:00:10", "first u1"),
        ("u1", "2026-01-01T00:00:05", "earlier u1 same batch"),
        ("u2", "2026-01-01T00:01:00", "first u2"),
    ])
    _write_batch(str(src), "b.parquet", [
        ("u1", "2026-01-02T00:00:00", "later dup u1"),
        ("u3", "2026-01-03T00:00:00", "first u3"),
    ])
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src)))
    out = dedup_first_seen(stream)
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r.url: r.text for r in spark.sql("select * from dedup_out").collect()}
    assert rows == {"u1": "earlier u1 same batch", "u2": "first u2",
                    "u3": "first u3"}


def test_ttl_evicts_state_and_url_passes_again(spark, tmp_path):
    """ADVICE r1: the TTL option must actually evict state. A url seen,
    expired (via an unrelated batch that fires the timeout), then seen
    again must pass twice."""
    import time

    src = tmp_path / "in_ttl"
    src.mkdir()
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src)))
    out = dedup_first_seen(stream, state_ttl_minutes=0.02)  # 1.2s TTL
    q = (out.writeStream.format("memory").queryName("ttl_out")
         .outputMode("append")
         .trigger(processingTime="500 milliseconds").start())
    try:
        _write_batch(str(src), "a.parquet",
                     [("u1", "2026-01-01T00:00:00", "first sighting")])
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select * from ttl_out where url='u1'").count() == 1:
                break
            time.sleep(0.5)
        time.sleep(2.5)  # let u1's 1.2s TTL expire
        # unrelated batch: triggers the timeout path → u1 state evicted
        _write_batch(str(src), "b.parquet",
                     [("u9", "2026-01-01T00:10:00", "unrelated")])
        while time.time() < deadline:
            if spark.sql("select * from ttl_out where url='u9'").count() == 1:
                break
            time.sleep(0.5)
        time.sleep(1.0)
        _write_batch(str(src), "c.parquet",
                     [("u1", "2026-01-02T00:00:00", "second sighting")])
        while time.time() < deadline:
            if spark.sql("select * from ttl_out where url='u1'").count() == 2:
                break
            time.sleep(0.5)
        texts = sorted(r.text for r in spark.sql(
            "select * from ttl_out where url='u1'").collect())
        assert texts == ["first sighting", "second sighting"]
    finally:
        q.stop()


def test_any_strategy_jvm_dedup(spark, tmp_path):
    """strategy='any': built-in streaming dropDuplicates — one row per
    url, JVM-side. TTL is rejected (earliest-only option)."""
    import pytest

    src = tmp_path / "in_any"
    src.mkdir()
    _write_batch(str(src), "a.parquet", [
        ("u1", "2026-01-01T00:00:10", "a"),
        ("u1", "2026-01-01T00:00:05", "b"),
        ("u2", "2026-01-01T00:01:00", "c"),
    ])
    _write_batch(str(src), "b.parquet", [
        ("u1", "2026-01-02T00:00:00", "d"),
        ("u3", "2026-01-03T00:00:00", "e"),
    ])
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src)))
    out = dedup_first_seen(stream, strategy="any")
    q = (out.writeStream.format("memory").queryName("dedup_any")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from dedup_any").collect()
    assert sorted(r.url for r in rows) == ["u1", "u2", "u3"]
    with pytest.raises(ValueError):
        dedup_first_seen(stream, strategy="any", state_ttl_minutes=1.0)
    with pytest.raises(ValueError):
        dedup_first_seen(stream, strategy="nope")
