"""Structured Streaming front-end for the quality-filter pipeline.

Reference analog (SURVEY.md §2.7): the remote-listing data source + state
bookmark — ``VaultDataSource`` discovers new files per run
(``wallaby2caom2/composable.py:153-177``) and ``state.yml`` records the
bookmark (``config/state.yml:1-3``). Here the file-source stream discovers
new clip parquet files, the streaming checkpoint IS the bookmark, and
``Trigger.availableNow`` gives the reference's time-boxed bounded-run
behavior (``config/config.yml:67-71``): process everything new, then stop.

Exactly-once: the sink is ``foreachBatch`` writing results partitioned by
deterministic clip_id bucket with dynamic partition overwrite (idempotent
per batch) + appending metrics keyed by (run_id, batch_id) — re-delivered
batches overwrite their own output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators.partitioning import with_bucket
from ..plans.pipeline import quality_filter, run_metrics
from ..sources.clips import CLIPS_SCHEMA


def stream_clips(
    spark: SparkSession, in_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a clips parquet directory (S3 analog)."""
    reader = spark.readStream.schema(CLIPS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(in_path)


def run_stream(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    n_buckets: int = 16,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    record_ops: bool = True,
) -> None:
    """One bounded streaming run: new files → pipeline → idempotent sink.

    Repeated invocations resume from ``<out_dir>/checkpoint`` and process
    only files not yet seen (the reference's bookmark-advance semantics).
    ``max_files_per_trigger`` chunks the backlog into micro-batches of that
    many files (ingest-sized commits: a crash mid-backlog resumes from the
    last committed batch instead of re-running everything); None drains the
    whole backlog as one batch.

    ``n_buckets`` is both the resume granularity AND the sink's write
    parallelism (one file per (batch_id, bucket)) — size it to the
    cluster's write bandwidth, not just to the resume unit.
    """
    os.makedirs(out_dir, exist_ok=True)
    results_path = os.path.join(out_dir, "results")
    metrics_path = os.path.join(out_dir, "metrics")

    clips = stream_clips(spark, in_path, max_files_per_trigger)
    # repartition=False: the pipeline's own salted exchange balances rows
    # for an arbitrary sink, but THIS sink partitions by bucket — writing
    # the salted 2N-partition layout through partitionBy("bucket") opens
    # 2N files per bucket dir (2,048 small files per micro-batch at 32
    # cores/16 buckets, measured ~7 s/batch of commit overhead at 1M
    # clips, BENCH/stream-scale.md). Instead the sink's bucket
    # repartition below is the batch's ONE exchange of slim rows: each
    # (batch_id, bucket) dir gets exactly one file, and the small-files
    # compaction job has nothing to do on streaming output.
    result = quality_filter(clips, cfg, repartition=False)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # partition by (batch_id, bucket): a retried epoch has the same
        # batch_id, so dynamic overwrite replaces exactly its own output and
        # never another batch's — exactly-once without a transactional store
        batch = (
            with_bucket(batch_df, n_buckets)
            .withColumn("batch_id", F.lit(batch_id))
            .repartition(n_buckets, F.col("bucket"))
        )
        # two sinks consume this micro-batch; without persist the second
        # write would re-run the whole fused decode+model pipeline from the
        # source files — doubling the dominant cost of every epoch
        batch.persist()
        # try/finally: a failed write raises into the streaming engine,
        # which RETRIES the batch with a fresh sink call — without the
        # finally, every retry would leak one more cached copy of the
        # micro-batch into executor memory
        try:
            (
                batch.write.mode("overwrite")
                # per-write dynamic overwrite: the exactly-once contract
                # must not depend on who built the session (STATIC would
                # truncate every earlier batch's partitions)
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id", "bucket")
                .parquet(results_path)
            )
            (
                run_metrics(batch.drop("batch_id"))
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(metrics_path)
            )
        finally:
            batch.unpersist()

    writer = (
        result.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(out_dir, "checkpoint"))
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.awaitTermination()
    if record_ops:
        # per-batch ingest rate + trigger timing → <out_dir>/ops_metrics
        # (streaming/progress.py; read synchronously post-termination)
        from .progress import write_ops_metrics

        write_ops_metrics(spark, query, out_dir)
