"""E5/E6 — partition-granularity checkpoint/resume + lineage metrics.

North rule (BASELINE.json:14): jobs resumable from checkpoint at partition
granularity with per-partition lineage and row-count/latency metrics in an
Iceberg(-style) metrics table.

Mechanism: a stage's output is bucketed by ``cell_prefix % n_buckets``;
each completed bucket lands as Parquet plus a manifest line. On restart,
``pending_buckets`` diffs the manifest against the full bucket set and the
stage reprocesses only the missing buckets (a `filter` on the bucket id —
partition pruning at the source when the input is bucket-partitioned).
One lineage row per bucket (rows in/out, wall latency, status) is appended
to the metrics table.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spandex_spark.tables import IcebergishTable

METRICS_SCHEMA = ("run_id string, stage string, bucket int, rows_in long, "
                  "rows_out long, t_start double, t_end double, status string")


class CheckpointedStage:
    """Run ``fn(bucket_df) -> DataFrame`` over pending buckets in batches;
    each BATCH commits atomically (data file write → one fsync'd manifest
    line naming all its buckets)."""

    def __init__(self, root: str, *, run_id: str, stage: str, n_buckets: int):
        self.root = os.path.join(root, stage)
        self.run_id = run_id
        self.stage = stage
        self.n_buckets = n_buckets
        self.manifest_path = os.path.join(self.root, "_completed.jsonl")
        self.metrics = IcebergishTable(os.path.join(root, "_metrics"))
        os.makedirs(self.root, exist_ok=True)

    # ------------------------------------------------------------ manifest

    def _manifest_records(self) -> list[dict]:
        """Committed batch records. The BATCH is the atomic commit unit: one
        fsync'd manifest line per batch listing all its buckets, so a crash
        can never leave a batch half-recorded (the per-bucket-line scheme
        could: some buckets recorded against a file that also held the
        others' rows → duplicate rows after resume). An unparsable trailing
        line (torn append mid-crash) is treated as never-committed and
        skipped; earlier lines are durable (fsync precedes every append)."""
        recs: list[dict] = []
        if not os.path.exists(self.manifest_path):
            return recs
        with open(self.manifest_path) as fh:
            lines = fh.readlines()
        for i, line in enumerate(lines):
            if not line.endswith("\n"):
                if i == len(lines) - 1:
                    continue  # unterminated trailing append — not committed
                raise ValueError(f"embedded unterminated manifest line {i}")
            if not line.strip():
                continue
            try:
                recs.append(json.loads(line))
            except ValueError:
                if i == len(lines) - 1:
                    continue  # torn trailing append — that batch never committed
                raise
        return recs

    def _heal_manifest(self) -> None:
        """Truncate a torn trailing line in place (atomic rewrite) so the
        next append starts on a clean line boundary — appending after a
        torn fragment would garble the new record too."""
        if not os.path.exists(self.manifest_path):
            return
        with open(self.manifest_path) as fh:
            raw = fh.read()
        good_end = 0
        for line in raw.splitlines(keepends=True):
            if not line.endswith("\n"):
                break
            try:
                json.loads(line)
            except ValueError:
                break
            good_end += len(line)
        if good_end != len(raw):
            tmp = self.manifest_path + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(raw[:good_end])
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, self.manifest_path)

    def completed_buckets(self) -> set[int]:
        done: set[int] = set()
        for rec in self._manifest_records():
            if "buckets" in rec:
                done.update(rec["buckets"])
            else:
                # back-compat: pre-batch-commit manifests wrote one
                # {"bucket": N} line per bucket — accept them so in-flight
                # checkpoint roots from older runs stay resumable
                done.add(rec["bucket"])
        return done

    def pending_buckets(self) -> list[int]:
        done = self.completed_buckets()
        return [b for b in range(self.n_buckets) if b not in done]

    # ------------------------------------------------------------ run

    def run(self, spark: SparkSession, source: DataFrame, bucket_col, fn,
            buckets_per_batch: int = 8) -> DataFrame:
        """Process pending buckets in batches; returns the full stage output
        (completed earlier + newly computed) as one DataFrame."""
        src = source.withColumn("_bucket", bucket_col % self.n_buckets)
        self._heal_manifest()
        pending = self.pending_buckets()
        for i in range(0, len(pending), buckets_per_batch):
            batch = pending[i:i + buckets_per_batch]
            t0 = time.time()
            part = src.filter(F.col("_bucket").isin(batch))
            in_counts = {int(r["_bucket"]): int(r["count"]) for r in
                         part.groupBy("_bucket").count().collect()}  # collect-ok: per-bucket row counts (lineage metrics, O(buckets))
            out = fn(part.drop("_bucket")).withColumn(
                "_bucket", bucket_col % self.n_buckets)
            out_path = os.path.join(self.root, f"batch-{batch[0]:05d}")
            # _bucket kept as a data column (not dir partitioning): batch dirs
            # stay uniform for multi-path reads; parquet min/max stats still
            # prune bucket filters.
            out.write.mode("overwrite").parquet(out_path)
            out_counts = {int(r["_bucket"]): int(r["count"]) for r in
                          spark.read.parquet(out_path)
                          .groupBy("_bucket").count().collect()}  # collect-ok: per-bucket row counts (lineage metrics, O(buckets))
            t1 = time.time()
            with open(self.manifest_path, "a") as fh:
                fh.write(json.dumps({"buckets": [int(b) for b in batch],
                                     "path": out_path,
                                     "run_id": self.run_id}) + "\n")
                fh.flush()
                os.fsync(fh.fileno())
            # lineage rows carry each bucket's OWN counts (a batch-level
            # count on every bucket row would inflate sums over the table)
            metric_rows = [(self.run_id, self.stage, int(b),
                            in_counts.get(int(b), 0), out_counts.get(int(b), 0),
                            t0, t1, "ok")
                           for b in batch]
            self.metrics.append(spark.createDataFrame(metric_rows, METRICS_SCHEMA))
        return self.read_output(spark)

    def read_output(self, spark: SparkSession) -> DataFrame:
        paths = sorted({rec["path"] for rec in self._manifest_records()})
        if not paths:
            raise FileNotFoundError(f"no completed buckets for stage {self.stage}")
        # batch-atomic commits guarantee every row in a manifest-listed file
        # belongs to a committed bucket; the filter is belt-and-braces against
        # an orphan file path being reused across runs
        done = self.completed_buckets()
        return (spark.read.parquet(*paths)
                .filter(F.col("_bucket").isin([int(b) for b in done]))
                .drop("_bucket"))

    def read_metrics(self, spark: SparkSession) -> DataFrame:
        return self.metrics.read(spark)
