"""Streaming ops-metrics tests (streaming/progress.py): every bounded run
appends one row per micro-batch with the ingest facts an operator needs —
input rows, processing rate, trigger-time breakdown — keyed by the query
run id so the table accumulates run history."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wallaby2caom2_spark import datagen
from wallaby2caom2_spark.streaming.stream import run_stream


def _ops(spark, out):
    return spark.read.parquet(os.path.join(out, "ops_metrics"))


def test_one_row_per_batch_rows_accounted(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    datagen.write_clips_parquet(inp, 200, seed=11, rows_per_file=50)
    # 4 files chunked 2-per-trigger → exactly 2 micro-batches
    run_stream(spark, inp, out, n_buckets=2, max_files_per_trigger=2)
    ops = _ops(spark, out).collect()
    assert len(ops) == 2
    assert sorted(r["batch_id"] for r in ops) == [0, 1]
    assert sum(r["num_input_rows"] for r in ops) == 200
    assert len({r["query_run_id"] for r in ops}) == 1
    for r in ops:
        assert r["trigger_ms"] > 0
        assert r["add_batch_ms"] > 0
        assert r["process_rows_per_sec"] > 0.0
        # the quality-filter stream holds no keyed state
        assert r["state_rows_total"] == 0
    # batch ids agree with the data the sink actually committed
    res_batches = {
        r["batch_id"]
        for r in spark.read.parquet(os.path.join(out, "results"))
        .select("batch_id")
        .distinct()
        .collect()
    }
    assert res_batches == {0, 1}


def test_runs_accumulate_and_noop_run_appends_nothing(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    datagen.write_clips_parquet(inp, 100, seed=12, rows_per_file=50)
    run_stream(spark, inp, out, n_buckets=2)
    first = _ops(spark, out)
    n_first = first.count()
    assert n_first >= 1
    run_id_1 = first.select("query_run_id").first()[0]

    # resume with NO new files: the no-op tick is recorded (one row,
    # zero input rows) — "the run happened and saw nothing" is an
    # operational fact, same as the reference's per-run progress record
    run_stream(spark, inp, out, n_buckets=2)
    after_noop = _ops(spark, out)
    assert after_noop.count() == n_first + 1
    assert (
        after_noop.agg(F.sum("num_input_rows")).collect()[0][0] == 100
    )

    # new files (flat in the watched dir) → a third run id appears,
    # rows account for exactly the delta
    import pyarrow.parquet as pq

    pq.write_table(
        datagen.generate_table(60, seed=13, start=100),
        os.path.join(inp, "part-new.parquet"),
    )
    run_stream(spark, inp, out, n_buckets=2)
    ops = _ops(spark, out)
    assert (
        ops.agg(F.sum("num_input_rows")).collect()[0][0] == 160
    )
    run_ids = {r["query_run_id"] for r in ops.collect()}
    assert len(run_ids) == 3 and run_id_1 in run_ids


def test_record_ops_opt_out(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    datagen.write_clips_parquet(inp, 50, seed=14, rows_per_file=50)
    run_stream(spark, inp, out, n_buckets=2, record_ops=False)
    assert not os.path.exists(os.path.join(out, "ops_metrics"))
