"""Maintenance-job tests (reference analog: the golden visitor tests,
``wallaby2caom2/tests/test_obs_plane_rename_visit.py:78-95`` — apply the
repair, diff the table)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wallaby2caom2_spark import datagen
from wallaby2caom2_spark.plans.maintenance import bulk_field_rewrite_job, rebucket_job
from wallaby2caom2_spark.plans.runner import run_resumable


@pytest.fixture(scope="module")
def results_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("maint")
    inp = str(root / "clips")
    out = str(root / "out")
    datagen.write_clips_parquet(inp, 400, seed=11, rows_per_file=200)
    run_resumable(spark, inp, out, n_buckets=4, n_waves=1)
    return os.path.join(out, "results")


def test_rebucket_preserves_rows(spark, results_dir, tmp_path):
    out = str(tmp_path / "rebucketed")
    rebucket_job(spark, results_dir, out, n_buckets=8)
    src = spark.read.parquet(results_dir)
    dst = spark.read.parquet(out)
    assert dst.count() == src.count()
    assert dst.select("bucket").distinct().count() == 8
    # same clip ids, every row re-homed by the recomputed key
    assert (
        dst.select("clip_id").subtract(src.select("clip_id")).count() == 0
    )
    # bucket matches the deterministic hash for every row
    from wallaby2caom2_spark.operators.partitioning import with_bucket

    recomputed = with_bucket(dst.drop("bucket"), 8).withColumnRenamed(
        "bucket", "expect"
    )
    joined = dst.select("clip_id", "bucket").join(
        recomputed.select("clip_id", "expect"), "clip_id"
    )
    assert joined.filter(F.col("bucket") != F.col("expect")).count() == 0


def test_bulk_field_rewrite(spark, results_dir):
    before = spark.read.parquet(results_dir)
    n_before = before.count()
    n_dropped = before.filter(~F.col("keep")).count()
    n = bulk_field_rewrite_job(
        spark,
        results_dir,
        field="drop_reason",
        value="quarantined",
        predicate=~F.col("keep"),
    )
    assert n == n_dropped
    after = spark.read.parquet(results_dir)
    assert after.count() == n_before
    assert after.filter(F.col("drop_reason") == "quarantined").count() == n_dropped
    assert after.filter(F.col("keep")).filter(
        F.col("drop_reason").isNotNull()
    ).count() == 0


def test_rewrite_crash_recovery(spark, tmp_path):
    """Crash-between-steps: whichever complete copy survives is promoted."""
    import shutil

    from wallaby2caom2_spark.plans.maintenance import recover_rewrite

    inp = str(tmp_path / "clips")
    datagen.write_clips_parquet(inp, 100, seed=31, rows_per_file=100)
    out = str(tmp_path / "out")
    run_resumable(spark, inp, out, n_buckets=2, n_waves=1)
    live = os.path.join(out, "results")
    n = spark.read.parquet(live).count()

    # crash after move-aside, before promote: live missing, .old + .rewrite
    shutil.copytree(live, live + ".rewrite")
    shutil.move(live, live + ".old")
    assert recover_rewrite(live) == "promoted_rewrite"
    assert spark.read.parquet(live).count() == n
    assert not os.path.exists(live + ".old")

    # crash before the move-aside: live intact, stale .rewrite left behind
    shutil.copytree(live, live + ".rewrite")
    assert recover_rewrite(live) == "live"
    assert not os.path.exists(live + ".rewrite")

    # crash mid-write of the rewrite: only .old remains usable
    shutil.move(live, live + ".old")
    assert recover_rewrite(live) == "restored_old"
    assert spark.read.parquet(live).count() == n


def test_rewrite_count_uses_pre_patch_predicate(spark, tmp_path):
    """The rewritten-row count must evaluate the predicate against the OLD
    values: observing it on the patched plan would count post-patch matches
    (0 when the predicate references the rewritten field)."""
    from pyspark.sql import functions as F

    from wallaby2caom2_spark.plans.maintenance import bulk_field_rewrite_job

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [("a", "pending"), ("b", "pending"), ("c", "done")],
        "clip_id string, status string",
    ).write.parquet(path)
    n = bulk_field_rewrite_job(
        spark, path, "status", "done", predicate=F.col("status") == "pending"
    )
    assert n == 2
    got = {r["clip_id"]: r["status"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": "done", "b": "done", "c": "done"}


def test_compact_results_job(spark, tmp_path):
    """Compaction must shrink over-fragmented partitions to their target
    file count, preserve every row byte-for-byte, skip already-compact
    partitions, and be idempotent."""
    from wallaby2caom2_spark.plans.maintenance import compact_results_job

    path = str(tmp_path / "frag")
    df = spark.range(4000).select(
        (F.col("id") % 4).cast("int").alias("bucket"),
        F.concat(F.lit("c"), F.col("id")).alias("clip_id"),
        (F.col("id") * 7 % 101).alias("v"),
    )
    # 12 tiny files per bucket
    (
        df.repartition(12)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    before = {
        tuple(sorted(r.asDict().items()))
        for r in spark.read.parquet(path).collect()
    }
    summary = compact_results_job(spark, path, target_mb=128)
    assert sorted(summary["compacted_buckets"]) == [0, 1, 2, 3]
    assert summary["files_after"] == 4  # one per bucket at this size
    assert summary["files_before"] > summary["files_after"]
    after = {
        tuple(sorted(r.asDict().items()))
        for r in spark.read.parquet(path).collect()
    }
    assert after == before
    # idempotent: second run touches nothing
    again = compact_results_job(spark, path, target_mb=128)
    assert again["compacted_buckets"] == []
    assert again["files_after"] == summary["files_after"]
