"""Streaming front-end tests: bounded availableNow runs, checkpoint resume
(exactly-once per clip), and watermarked windowed rollups.

Mirrors the reference's incremental-run contract: each invocation processes
only work newer than the bookmark (``config/state.yml:1-3``), and re-runs
never double-process (``tests/test_composable.py`` orchestration style).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from wallaby2caom2_spark import datagen
from wallaby2caom2_spark.plans.pipeline import quality_filter
from wallaby2caom2_spark.sources.clips import read_clips
from wallaby2caom2_spark.streaming.stream import run_stream
from wallaby2caom2_spark.streaming.windows import windowed_rollup


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    inp = str(root / "clips")
    datagen.write_clips_parquet(inp, 300, seed=7, rows_per_file=100)
    return inp, str(root / "out")


def test_available_now_processes_all(spark, stream_dirs):
    inp, out = stream_dirs
    shutil.rmtree(out, ignore_errors=True)
    run_stream(spark, inp, out, n_buckets=4)
    res = spark.read.parquet(os.path.join(out, "results"))
    assert res.count() == 300
    assert res.select("clip_id").distinct().count() == 300
    # streaming result matches the batch pipeline row-for-row
    batch = quality_filter(read_clips(spark, inp))
    got = {
        r["clip_id"]: (r["keep"], r["drop_reason"])
        for r in res.select("clip_id", "keep", "drop_reason").collect()
    }
    want = {
        r["clip_id"]: (r["keep"], r["drop_reason"])
        for r in batch.select("clip_id", "keep", "drop_reason").collect()
    }
    assert got == want


def test_checkpoint_resume_is_incremental(spark, stream_dirs):
    inp, out = stream_dirs
    # second run with no new files: no-op (bookmark already at head)
    run_stream(spark, inp, out, n_buckets=4)
    res = spark.read.parquet(os.path.join(out, "results"))
    assert res.count() == 300
    # land new files → only they are processed, totals grow exactly once
    extra = datagen.generate_table(100, seed=7, start=300)
    import pyarrow.parquet as pq

    pq.write_table(extra, os.path.join(inp, "part-new.parquet"))
    run_stream(spark, inp, out, n_buckets=4)
    res2 = spark.read.parquet(os.path.join(out, "results"))
    assert res2.count() == 400
    assert res2.select("clip_id").distinct().count() == 400


def test_windowed_rollup_batch_equivalence(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rolled = windowed_rollup(ev, "1 hour", "2 hours")
    direct = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                "sum_value_cents"
            ),
        )
    )
    assert sorted(map(tuple, rolled.collect())) == sorted(map(tuple, direct.collect()))


def test_windowed_rollup_streaming_drops_stale(spark, tmp_path):
    """Late rows beyond the watermark are dropped in streaming mode."""
    from datetime import timedelta

    ev_dir = str(tmp_path / "ev")
    batches: list = []
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").orderBy("ts")
    ev.limit(2000).write.parquet(ev_dir)
    stream = spark.readStream.schema(ev.schema).parquet(ev_dir)
    q = (
        windowed_rollup(stream, "1 hour", "2 hours")
        .writeStream.foreachBatch(
            lambda df, _id: batches.append(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "streaming rollup did not finish in 300s"
    emitted = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for b in batches
        for r in b
    }
    # batch truth for the same slice
    full_df = windowed_rollup(
        spark.read.parquet(ev_dir), "1 hour", "2 hours"
    ).collect()
    full = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for r in full_df
    }
    wm = max(r["window_start"] for r in full_df) - timedelta(hours=2)
    # append mode emits ONLY windows finalized by the watermark: something
    # must emit, the head-of-stream windows must be withheld, and every
    # finalized window must carry the exact batch aggregate
    assert emitted, "append mode emitted nothing"
    assert set(emitted) < set(full), "watermark withheld no windows"
    for (start, _etype), agg in emitted.items():
        assert start + timedelta(hours=1) <= wm + timedelta(seconds=1)
    for key, agg in emitted.items():
        assert full[key] == agg, key


def test_stream_hourly_rollup_gate_query(spark):
    """The registry's streaming entry: a real readStream run whose drained
    result equals the batch aggregate (what the DuckDB oracle replays), and
    whose fixed-name memory sink survives repeated invocation in one
    session (the driver calls each query more than once)."""
    from wallaby2caom2_spark.queries.streaming import stream_hourly_rollup

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for r in stream_hourly_rollup(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for r in (
            ev.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
                    "hour"
                ),
                "event_type",
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                    "sum_value_cents"
                ),
            )
            .collect()
        )
    }
    assert got == want
    # second invocation must re-own the sink name and return the same rows
    again = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for r in stream_hourly_rollup(spark, sf_dir).collect()
    }
    assert again == want


def test_chunked_drain_commits_per_batch(spark, tmp_path):
    """maxFilesPerTrigger chunks the backlog into several committed
    micro-batches; the union of their outputs is exactly the corpus, each
    batch owns its own (batch_id, bucket) partitions."""
    inp = str(tmp_path / "clips")
    datagen.write_clips_parquet(inp, 300, seed=11, rows_per_file=50)
    out = str(tmp_path / "out")
    run_stream(spark, inp, out, n_buckets=4, max_files_per_trigger=2)
    res = spark.read.parquet(os.path.join(out, "results"))
    assert res.count() == 300
    assert res.select("clip_id").distinct().count() == 300
    n_batches = res.select("batch_id").distinct().count()
    assert n_batches == 3, n_batches  # 6 files / 2 per trigger
    # small-files contract: the sink's bucket repartition means each
    # committed (batch_id, bucket) dir holds exactly ONE data file
    import glob

    for d in glob.glob(os.path.join(out, "results", "batch_id=*", "bucket=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)


def test_stream_quality_filter_gate_query_is_multi_batch(spark):
    """The gate-facing streaming flagship (queries/streaming.py
    stream_quality_filter) must (a) drain the sf0.001 cache in MORE than
    one micro-batch (one part file per trigger — a real backlog drain,
    not the single-batch degenerate case) and (b) produce the identical
    triage to the batch pipeline."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from wallaby2caom2_spark.plans.pipeline import quality_filter
    from wallaby2caom2_spark.queries.clips_flagship import clips_path_for
    from wallaby2caom2_spark.queries.streaming import stream_quality_filter
    from wallaby2caom2_spark.streaming.stream import run_stream

    sf = "/root/testdata/sf0.001"
    streamed = {
        r["outcome"]: (r["n_clips"], r["scrub_edits"])
        for r in stream_quality_filter(spark, sf).collect()
    }
    batch = {
        r["outcome"]: (r["n_clips"], r["scrub_edits"])
        for r in (
            quality_filter(spark.read.parquet(clips_path_for(sf)))
            .groupBy(F.coalesce("drop_reason", F.lit("kept")).alias("outcome"))
            .agg(
                F.count("*").alias("n_clips"),
                F.sum("scrub_edits").alias("scrub_edits"),
            )
            .collect()
        )
    }
    assert streamed == batch
    # multi-batch: drain the same input ourselves and count sink batches
    work = tempfile.mkdtemp(prefix="wallaby_stream_qf_test_")
    try:
        run_stream(
            spark, clips_path_for(sf), work, n_buckets=4,
            max_files_per_trigger=1, record_ops=False,
        )
        batches = (
            spark.read.parquet(os.path.join(work, "results"))
            .select("batch_id").distinct().count()
        )
        assert batches >= 2, "one file per trigger must yield multiple batches"
    finally:
        shutil.rmtree(work, ignore_errors=True)
