"""Lineage + metrics sinks (S9/S10 analogs).

Reference: per-item success/failure/retry logs + progress counts + the
"observable" metrics directory (``config/config.yml:28-54``). Here: one
append-only parquet dataset per concern, written per committed wave —
lineage rows carry (run_id, wave, bucket, status, clips) so the resume
test can assert exactly-once per clip, and metrics rows carry the
north-rule counters.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append_lineage(
    spark: SparkSession,
    path: str,
    run_id: str,
    wave: int,
    bucket_counts: list[tuple[int, int]],
) -> None:
    df = spark.createDataFrame(
        [(run_id, wave, b, "ok", int(n), float(time.time())) for b, n in bucket_counts],
        "run_id string, wave int, bucket int, status string, clips long, ts double",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def append_metrics(metrics: DataFrame, path: str, run_id: str) -> None:
    (
        metrics.withColumn("run_id", F.lit(run_id))
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )
