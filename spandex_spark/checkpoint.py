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
    """Run ``fn(bucket_df) -> DataFrame`` once per pending bucket, each
    bucket committed atomically (write → fsync manifest line)."""

    def __init__(self, root: str, *, run_id: str, stage: str, n_buckets: int):
        self.root = os.path.join(root, stage)
        self.run_id = run_id
        self.stage = stage
        self.n_buckets = n_buckets
        self.manifest_path = os.path.join(self.root, "_completed.jsonl")
        self.metrics = IcebergishTable(os.path.join(root, "_metrics"))
        os.makedirs(self.root, exist_ok=True)

    # ------------------------------------------------------------ manifest

    def completed_buckets(self) -> set[int]:
        done = set()
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as fh:
                for line in fh:
                    rec = json.loads(line)
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
        pending = self.pending_buckets()
        for i in range(0, len(pending), buckets_per_batch):
            batch = pending[i:i + buckets_per_batch]
            t0 = time.time()
            part = src.filter(F.col("_bucket").isin(batch))
            rows_in = part.count()
            out = fn(part.drop("_bucket")).withColumn(
                "_bucket", bucket_col % self.n_buckets)
            out_path = os.path.join(self.root, f"batch-{batch[0]:05d}")
            # _bucket kept as a data column (not dir partitioning): batch dirs
            # stay uniform for multi-path reads; parquet min/max stats still
            # prune bucket filters.
            out.write.mode("overwrite").parquet(out_path)
            rows_out = spark.read.parquet(out_path).count()
            t1 = time.time()
            with open(self.manifest_path, "a") as fh:
                for b in batch:
                    fh.write(json.dumps({"bucket": b, "path": out_path,
                                         "run_id": self.run_id}) + "\n")
                fh.flush()
                os.fsync(fh.fileno())
            metric_rows = [(self.run_id, self.stage, int(b),
                            int(rows_in), int(rows_out), t0, t1, "ok")
                           for b in batch]
            self.metrics.append(spark.createDataFrame(metric_rows, METRICS_SCHEMA))
        return self.read_output(spark)

    def read_output(self, spark: SparkSession) -> DataFrame:
        paths = sorted({json.loads(line)["path"]
                        for line in open(self.manifest_path)}) \
            if os.path.exists(self.manifest_path) else []
        if not paths:
            raise FileNotFoundError(f"no completed buckets for stage {self.stage}")
        return spark.read.parquet(*paths).drop("_bucket")

    def read_metrics(self, spark: SparkSession) -> DataFrame:
        return self.metrics.read(spark)
