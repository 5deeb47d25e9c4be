"""Streaming MERGE into the snapshot table: latest-wins across waves,
bookmark resume (no-op re-run), and per-batch metrics idempotence."""

from __future__ import annotations

import os
import shutil

import pytest

from wallaby2caom2_spark import datagen
from wallaby2caom2_spark.plans.pipeline import quality_filter
from wallaby2caom2_spark.sources import snapshot_table as st
from wallaby2caom2_spark.sources.clips import read_clips
from wallaby2caom2_spark.streaming.upsert_stream import run_upsert_stream

N = 150


def _filter_state(spark, clips_path):
    return {
        r["clip_id"]: (r["keep"], r["scrubbed_transcript"])
        for r in quality_filter(
            read_clips(spark, clips_path), repartition=False
        ).collect()
    }


def _table_state(spark, table_path):
    return {
        r["clip_id"]: (r["keep"], r["scrubbed_transcript"])
        for r in st.read_table(spark, table_path).collect()
    }


@pytest.fixture()
def dirs(tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    return str(inp), str(tmp_path / "out")


def _add_wave(in_dir: str, stage_dir: str, n: int, seed: int, tag: str):
    """Generate a wave and drop its files FLAT into the watched dir (the
    file-source stream does not recurse) under unique names."""
    datagen.write_clips_parquet(stage_dir, n, seed=seed)
    for f in os.listdir(stage_dir):
        shutil.copy(
            os.path.join(stage_dir, f), os.path.join(in_dir, f"{tag}_{f}")
        )


def test_two_wave_upsert_latest_wins(spark, dirs, tmp_path):
    in_dir, out = dirs
    wave1 = str(tmp_path / "stage1")
    _add_wave(in_dir, wave1, N, seed=11, tag="w1")
    run_upsert_stream(spark, in_dir, out, n_buckets=4)

    table = os.path.join(out, "table")
    assert _table_state(spark, table) == _filter_state(spark, wave1)
    v_after_wave1 = st.current_version(table)

    # wave 2: same clip_ids, different content (seed changes audio+text),
    # arriving as NEW FILES the stream discovers past its bookmark
    wave2 = str(tmp_path / "stage2")
    _add_wave(in_dir, wave2, N, seed=22, tag="w2")
    run_upsert_stream(spark, in_dir, out, n_buckets=4)

    # upsert semantics: wave-2 keys override wave-1 rows (UPDATE), keys
    # only in one wave survive (INSERT / retained) — the seed also moves
    # some ids between the hot_/clip_ prefixes, so both cases occur
    f1, f2 = _filter_state(spark, wave1), _filter_state(spark, wave2)
    assert set(f1) != set(f2)  # the test exercises inserts, not just updates
    assert _table_state(spark, table) == {**f1, **f2}
    assert st.current_version(table) > v_after_wave1


def test_rerun_without_new_files_is_noop(spark, dirs):
    in_dir, out = dirs
    datagen.write_clips_parquet(in_dir, N, seed=11)
    run_upsert_stream(spark, in_dir, out, n_buckets=4)
    table = os.path.join(out, "table")
    v = st.current_version(table)
    run_upsert_stream(spark, in_dir, out, n_buckets=4)  # bookmark: no new files
    assert st.current_version(table) == v


def test_metrics_one_row_per_batch(spark, dirs):
    in_dir, out = dirs
    datagen.write_clips_parquet(in_dir, N, seed=11)
    run_upsert_stream(spark, in_dir, out, n_buckets=4)
    m = spark.read.parquet(os.path.join(out, "metrics"))
    rows = m.collect()
    assert len(rows) == 1
    assert rows[0]["inserted"] == N and rows[0]["updated"] == 0


def test_crash_after_merge_before_checkpoint_converges(spark, dirs, monkeypatch):
    """THE streaming-merge failure case: the batch's merge COMMITS, then
    the job dies before the streaming checkpoint records the batch — on
    restart the file source re-delivers the same batch and the merge runs
    again. State must converge (same keys, same content → the re-merge
    updates rows to the values they already hold), and the metrics row is
    REPLACED, not duplicated."""
    import wallaby2caom2_spark.streaming.upsert_stream as us

    in_dir, out = dirs
    datagen.write_clips_parquet(in_dir, N, seed=11)

    real_upsert = us.upsert_batch
    calls = {"n": 0}

    def crashing_upsert(*a, **kw):
        stats = real_upsert(*a, **kw)
        calls["n"] += 1
        raise RuntimeError("injected crash after merge commit")

    monkeypatch.setattr(us, "upsert_batch", crashing_upsert)
    with pytest.raises(Exception, match="injected crash"):
        run_upsert_stream(spark, in_dir, out, n_buckets=4)
    assert calls["n"] == 1
    table = os.path.join(out, "table")
    # the merge itself committed before the crash
    assert st.is_snapshot_table(table)

    monkeypatch.setattr(us, "upsert_batch", real_upsert)
    run_upsert_stream(spark, in_dir, out, n_buckets=4)  # re-delivery
    # converged: exactly the batch pipeline's rows, no duplicates
    assert _table_state(spark, table) == _filter_state(spark, in_dir)
    m = spark.read.parquet(os.path.join(out, "metrics")).collect()
    assert len(m) == 1  # replaced, not appended
