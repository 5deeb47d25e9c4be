"""Kill/restart exactly-once tests (reference analog: state bookmark +
retry bookkeeping, ``config/state.yml:1-3`` + ``config/config.yml:38-47``;
orchestration-test style of ``wallaby2caom2/tests/test_composable.py:112-151``
— run, assert per-item effects and counts)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wallaby2caom2_spark import datagen
from wallaby2caom2_spark.plans.runner import SimulatedCrash, run_resumable


@pytest.fixture(scope="module")
def clips_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("clips_in") / "clips")
    datagen.write_clips_parquet(p, 600, seed=11)
    return p


def test_crash_then_resume_exactly_once(spark, clips_path, tmp_path):
    out = str(tmp_path / "out")
    with pytest.raises(SimulatedCrash):
        run_resumable(
            spark, clips_path, out, n_buckets=8, n_waves=4, fail_after_wave=1
        )
    # partial state: some buckets committed, not all
    done_partial = set()
    import json

    with open(os.path.join(out, "checkpoint.json")) as f:
        done_partial = set(json.load(f)["done"])
    assert 0 < len(done_partial) < 8

    summary = run_resumable(spark, clips_path, out, n_buckets=8, n_waves=4)
    assert set(summary["buckets"]) == set(range(8)) - done_partial

    result = spark.read.parquet(os.path.join(out, "results"))
    # exactly-once: every clip appears exactly once
    assert result.count() == 600
    assert result.select("clip_id").distinct().count() == 600
    # third run is a no-op
    assert run_resumable(spark, clips_path, out, n_buckets=8)["waves"] == 0


def test_results_match_single_shot(spark, clips_path, tmp_path):
    from wallaby2caom2_spark.plans.pipeline import quality_filter
    from wallaby2caom2_spark.sources.clips import read_clips

    out = str(tmp_path / "out2")
    run_resumable(spark, clips_path, out, n_buckets=4, n_waves=2)
    resumed = spark.read.parquet(os.path.join(out, "results"))
    single = quality_filter(read_clips(spark, clips_path))
    a = {r["clip_id"]: (r["keep"], r["drop_reason"]) for r in resumed.collect()}
    b = {r["clip_id"]: (r["keep"], r["drop_reason"]) for r in single.collect()}
    assert a == b


def test_lineage_covers_all_buckets(spark, clips_path, tmp_path):
    out = str(tmp_path / "out3")
    run_resumable(spark, clips_path, out, n_buckets=4, n_waves=2, run_id="r1")
    lineage = spark.read.parquet(os.path.join(out, "lineage"))
    assert set(
        r["bucket"] for r in lineage.select("bucket").distinct().collect()
    ) == set(range(4))
    total = lineage.agg(F.sum("clips")).collect()[0][0]
    assert total == 600
    metrics = spark.read.parquet(os.path.join(out, "metrics"))
    assert metrics.filter(F.col("outcome") == "kept").count() > 0
