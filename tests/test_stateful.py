"""Stateful streaming dedup tests (applyInPandasWithState): redelivered
clip_ids are emitted exactly once across micro-batches of one run, and the
state store survives a stop/restart of the query (checkpoint)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wallaby2caom2_spark.streaming.stateful import dedup_stream

SCHEMA = pa.schema([("clip_id", pa.string())])


def _write(path: str, name: str, ids: list[str]) -> None:
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.table({"clip_id": ids}, schema=SCHEMA), os.path.join(path, name))


def _run_once(spark, in_dir: str, out: list, ckpt: str) -> None:
    stream = (
        spark.readStream.schema("clip_id string")
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .parquet(in_dir)
    )
    q = (
        dedup_stream(stream, n_groups=4)
        .writeStream.foreachBatch(
            lambda df, _id: out.extend(r["clip_id"] for r in df.collect())
        )
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"


def test_cross_batch_dedup(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    _write(in_dir, "f1.parquet", ["a", "b", "c"])
    _write(in_dir, "f2.parquet", ["b", "c", "d"])  # b, c redelivered
    out: list = []
    _run_once(spark, in_dir, out, ckpt)
    assert sorted(out) == ["a", "b", "c", "d"]


def test_state_survives_restart(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    _write(in_dir, "f1.parquet", ["x", "y"])
    out: list = []
    _run_once(spark, in_dir, out, ckpt)
    assert sorted(out) == ["x", "y"]
    # new run, new file redelivering x plus fresh z: state store remembers x
    _write(in_dir, "f2.parquet", ["x", "z"])
    out2: list = []
    _run_once(spark, in_dir, out2, ckpt)
    assert out2 == ["z"]


# ---------------------------------------------------------------------------
# session assembly (event-time timeout)
# ---------------------------------------------------------------------------

import datetime as _dt

import pandas as _pd

from wallaby2caom2_spark.streaming.stateful import session_stream

_EV_SCHEMA = "clip_id string, source_id string, event_ts timestamp"


def _write_events(path: str, name: str, rows: list[tuple]) -> None:
    os.makedirs(path, exist_ok=True)
    pdf = _pd.DataFrame(rows, columns=["clip_id", "source_id", "event_ts"])
    # Spark reads timestamp as µs; pyarrow defaults to ns — pin the schema
    schema = pa.schema(
        [
            ("clip_id", pa.string()),
            ("source_id", pa.string()),
            ("event_ts", pa.timestamp("us")),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        os.path.join(path, name),
    )


def _run_sessions(spark, in_dir: str, out: list, ckpt: str) -> None:
    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        session_stream(stream, gap_minutes=30)
        .writeStream.foreachBatch(
            lambda df, _id: out.extend(
                (r["source_id"], r["n_clips"], r["start_ms"], r["end_ms"])
                for r in df.collect()
            )
        )
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"


def _ts(h: int, m: int = 0) -> _dt.datetime:
    return _dt.datetime(2024, 1, 1, h, m)


def _ms(h: int, m: int = 0) -> int:
    """Expected epoch millis as the UTC-pinned pipeline computes them —
    naive .timestamp() would shift by the HOST timezone offset and fail
    these tests on any non-UTC machine."""
    return int(
        _ts(h, m).replace(tzinfo=_dt.timezone.utc).timestamp() * 1000
    )


def test_session_closed_by_event_time_not_arrival(spark, tmp_path):
    """s1's session closes when the WATERMARK passes its last event + gap —
    triggered by s2's later events arriving in the next micro-batch."""
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    _write_events(in_dir, "f1.parquet", [
        ("c1", "s1", _ts(10, 0)),
        ("c2", "s1", _ts(10, 5)),
    ])
    _write_events(in_dir, "f2.parquet", [
        ("c3", "s2", _ts(12, 0)),  # watermark jumps past 10:05 + 30min
    ])
    out: list = []
    _run_sessions(spark, in_dir, out, ckpt)
    assert out == [
        ("s1", 2, _ms(10, 0), _ms(10, 5))
    ]
    # s2 still open; a later event in a NEW run flushes it via the
    # checkpointed state store (state survives restart)
    _write_events(in_dir, "f3.parquet", [("c4", "s3", _ts(14, 0))])
    out2: list = []
    _run_sessions(spark, in_dir, out2, ckpt)
    assert out2 == [
        ("s2", 1, _ms(12, 0), _ms(12, 0))
    ]


def test_session_gap_keeps_one_session_open(spark, tmp_path):
    """Events within the gap extend the same session instead of closing it."""
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    _write_events(in_dir, "f1.parquet", [("c1", "s1", _ts(9, 0))])
    _write_events(in_dir, "f2.parquet", [("c2", "s1", _ts(9, 20))])  # < 30min gap
    _write_events(in_dir, "f3.parquet", [("c3", "s2", _ts(13, 0))])  # closes s1
    out: list = []
    _run_sessions(spark, in_dir, out, ckpt)
    assert out == [
        ("s1", 2, _ms(9, 0), _ms(9, 20))
    ]


# ---------------------------------------------------------------------------
# per-source quota (Spark 4 transformWithStateInPandas)
# ---------------------------------------------------------------------------

from wallaby2caom2_spark.streaming.stateful import quota_stream


def _write_quota(path: str, name: str, rows: list[tuple]) -> None:
    os.makedirs(path, exist_ok=True)
    pdf = _pd.DataFrame(rows, columns=["clip_id", "source_id"])
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(path, name),
    )


def _run_quota(spark, in_dir: str, out: list, ckpt: str, quota: int) -> None:
    stream = (
        spark.readStream.schema("clip_id string, source_id string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        quota_stream(stream, quota=quota)
        .writeStream.foreachBatch(
            lambda df, _id: out.extend(
                (r["clip_id"], r["source_id"], r["n_before"], r["admitted"])
                for r in df.collect()
            )
        )
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"


def test_quota_enforced_across_batches(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    _write_quota(in_dir, "f1.parquet", [("a1", "s1"), ("a2", "s1"), ("b1", "s2")])
    _write_quota(in_dir, "f2.parquet", [("a3", "s1"), ("a4", "s1"), ("b2", "s2")])
    out: list = []
    _run_quota(spark, in_dir, out, ckpt, quota=3)
    by_clip = {c: (n, adm) for c, _s, n, adm in out}
    assert len(out) == 6  # every row gets a decision — nothing silently dropped
    # s1: a1, a2 admitted in batch 1; a3 takes the last slot in batch 2
    assert by_clip["a1"][1] and by_clip["a2"][1] and by_clip["a3"][1]
    assert not by_clip["a4"][1]  # over quota
    assert by_clip["a4"][0] == 3  # running count carried across batches
    assert by_clip["b1"][1] and by_clip["b2"][1]  # s2 well under quota


def test_builtin_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark drops redeliveries that arrive inside
    the watermark horizon (first delivery wins), streaming end-to-end."""
    import os

    from pyspark.sql import functions as F
    from wallaby2caom2_spark.streaming.stateful import (
        dedup_builtin_within_watermark,
    )

    src = str(tmp_path / "src")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    base = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00"), ("b", "2024-01-01 10:00:10"),
         ("a", "2024-01-01 10:00:20"),  # redelivery within horizon
         ("c", "2024-01-01 10:00:30")],
        "clip_id string, ts string",
    ).withColumn("ingest_ts", F.col("ts").cast("timestamp")).drop("ts")
    base.coalesce(1).write.parquet(src + "/batch0")

    stream = spark.readStream.schema(
        "clip_id string, ingest_ts timestamp"
    ).parquet(src + "/*")
    q = (
        dedup_builtin_within_watermark(stream, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(outp)
    assert got.count() == 3
    assert {r["clip_id"] for r in got.collect()} == {"a", "b", "c"}
