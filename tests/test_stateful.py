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
    q.awaitTermination()


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
