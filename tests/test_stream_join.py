"""Stream-stream interval join: batch equivalence + a real two-file-source
streaming run (availableNow) matching the batch result pair-for-pair."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wallaby2caom2_spark.streaming.joins import interval_attribution_join

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def split_events(spark, tmp_path_factory):
    """events split by type into two parquet dirs (the two stream sources)."""
    root = tmp_path_factory.mktemp("sjoin")
    ev = spark.read.parquet(EVENTS)
    base_dir, follow_dir = str(root / "signup"), str(root / "click")
    ev.filter(F.col("event_type") == "signup").coalesce(2).write.parquet(base_dir)
    ev.filter(F.col("event_type") == "click").coalesce(2).write.parquet(follow_dir)
    return base_dir, follow_dir


def _expected_pairs(spark, base_dir, follow_dir):
    b = spark.read.parquet(base_dir).select(
        "user_id", F.col("ts").cast("timestamp").alias("b_ts"), "event_id"
    )
    f = spark.read.parquet(follow_dir).select(
        F.col("user_id").alias("f_user"),
        F.col("ts").cast("timestamp").alias("f_ts"),
        F.col("event_id").alias("f_event"),
    )
    joined = b.join(
        f,
        (b.user_id == f.f_user)
        & (f.f_ts > b.b_ts)
        & (f.f_ts <= b.b_ts + F.expr("INTERVAL 1 HOUR")),
    )
    return {
        (r["event_id"], r["f_event"]) for r in joined.collect()
    }


def test_batch_degradation_matches_plain_join(spark, split_events):
    base_dir, follow_dir = split_events
    out = interval_attribution_join(
        spark.read.parquet(base_dir), spark.read.parquet(follow_dir)
    )
    got = {(r["base_event"], r["follow_event"]) for r in out.collect()}
    assert got == _expected_pairs(spark, base_dir, follow_dir)
    assert len(got) > 0  # fixture actually exercises the interval


def test_streaming_run_matches_batch(spark, split_events, tmp_path):
    base_dir, follow_dir = split_events
    schema = spark.read.parquet(base_dir).schema
    b_stream = spark.readStream.schema(schema).parquet(base_dir)
    f_stream = spark.readStream.schema(schema).parquet(follow_dir)
    joined = interval_attribution_join(b_stream, f_stream)
    assert joined.isStreaming
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    x = q.awaitTermination(180)
    assert x, "stream-stream join did not finish in 180s"
    res = spark.read.parquet(out)
    got = {(r["base_event"], r["follow_event"]) for r in res.collect()}
    assert got == _expected_pairs(spark, base_dir, follow_dir)
