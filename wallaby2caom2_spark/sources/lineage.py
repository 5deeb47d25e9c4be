"""Lineage + metrics sinks (S9/S10 analogs).

Reference: per-item success/failure/retry logs + progress counts + the
"observable" metrics directory (``config/config.yml:28-54``). Here: one
parquet dataset per concern, written per committed wave.

Idempotence under crash-resume: both sinks are partitioned by
``(run_id, bucket)`` — the BUCKET, not the wave, because a resumed run
renumbers its waves from zero — and written with dynamic partition
overwrite, so a wave that crashed AFTER its lineage/metrics write but
BEFORE the checkpoint commit simply replaces its buckets' rows on the
re-run; a plain append would double-count those clips in any consumer
summing the dataset.
Lineage rows carry (run_id, wave, bucket, status, clips) so the resume
test can assert exactly-once per clip; metrics rows carry the north-rule
counters.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def check_run_id(run_id: str) -> str:
    """``run_id`` becomes a PARTITION DIRECTORY name, and Spark's partition
    reader type-infers directory values: an id that parses as a number —
    a 12-char hex like ``6e0612805002`` reads back as the DOUBLE 6e+612 →
    Infinity — silently corrupts every read of the lineage/metrics tables.
    Caught live (run_id column showed ``Infinity`` on read-back). Writers
    refuse ambiguous ids loudly instead; ``run_resumable`` mints ids with
    an ``r`` prefix so generated ids can never collide with the rule."""
    try:
        float(run_id)
    except ValueError:
        return run_id
    raise ValueError(
        f"run_id {run_id!r} parses as a number and would be type-inferred "
        "as a partition value on read — prefix it with a letter"
    )


def append_lineage(
    spark: SparkSession,
    path: str,
    run_id: str,
    wave: int,
    bucket_counts: list[tuple[int, int]],
) -> None:
    run_id = check_run_id(run_id)
    df = spark.createDataFrame(
        [(run_id, wave, b, "ok", int(n), float(time.time())) for b, n in bucket_counts],
        "run_id string, wave int, bucket int, status string, clips long, ts double",
    )
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("run_id", "bucket")
        .parquet(path)
    )


def append_metrics(
    metrics: DataFrame, path: str, run_id: str, wave: int = 0
) -> None:
    """``metrics`` must carry a ``bucket`` column (run_metrics with
    ``extra_keys=("bucket",)``) — the overwrite key that keeps re-runs of a
    crashed-but-sunk wave from double-counting."""
    run_id = check_run_id(run_id)
    (
        metrics.withColumn("run_id", F.lit(run_id))
        .withColumn("wave", F.lit(wave))
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("run_id", "bucket")
        .parquet(path)
    )
