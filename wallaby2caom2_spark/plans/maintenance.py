"""Standalone maintenance jobs over an existing results table.

Reference analogs: the one-off repair visitors — artifact re-homing
(``wallaby2caom2/fix_product_id_visit.py:76-107``) and the bulk release-date
rewrite (``scripts/fix_release_dates.py:72-91``) — re-expressed as
read → transform → idempotent partitioned overwrite jobs. This proves the
visitor-chain architecture generalizes: a maintenance job is just another
``DataFrame -> DataFrame`` stage applied to the results table instead of the
input table.

At 100 TB: both jobs are embarrassingly parallel per partition (narrow
rewrite; the re-bucket job's single shuffle moves slim result rows), and
dynamic partition overwrite keeps re-runs safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.partitioning import with_bucket


def rebucket_job(
    spark: SparkSession, results_path: str, out_path: str, n_buckets: int
) -> int:
    """J1 analog: recompute every row's home bucket (e.g. after changing the
    bucket count) and regroup the table under the new key."""
    df = spark.read.parquet(results_path)
    rekeyed = with_bucket(df.drop("bucket"), n_buckets)
    (
        rekeyed.repartition(n_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_path)
    )
    return n_buckets


def bulk_field_rewrite_job(
    spark: SparkSession,
    results_path: str,
    field: str,
    value,
    predicate: F.Column | None = None,
) -> int:
    """P19 analog: set ``field`` to ``value`` on every (matching) row of the
    results table, rewriting partitions in place idempotently.

    Returns the number of rows rewritten.
    """
    df = spark.read.parquet(results_path)
    cond = predicate if predicate is not None else F.lit(True)
    patched = df.withColumn(
        field, F.when(cond, F.lit(value)).otherwise(F.col(field))
    )
    n = patched.filter(cond).count()
    writer = patched.write.mode("overwrite")
    if "bucket" in patched.columns:
        writer = writer.partitionBy("bucket")
    # parquet has no transactional replace of the SAME directory while
    # reading from it — stage to a sibling then swap would be the prod path;
    # here we materialize first (count() above) then overwrite
    writer.parquet(results_path + ".rewrite")
    import shutil

    shutil.rmtree(results_path)
    shutil.move(results_path + ".rewrite", results_path)
    # drop the cached file index — the old listing points at deleted files
    spark.catalog.refreshByPath(results_path)
    return n
