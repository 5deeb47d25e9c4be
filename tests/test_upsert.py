"""Merge/upsert tests (J2/S8 analog: read-modify-write of existing records,
``wallaby2caom2/tests/test_caom_gen_visit.py:109-117``)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wallaby2caom2_spark import datagen
from wallaby2caom2_spark.operators.partitioning import with_bucket
from wallaby2caom2_spark.operators.upsert import merge_upsert
from wallaby2caom2_spark.plans.pipeline import quality_filter


@pytest.fixture()
def target(spark, tmp_path):
    inp = str(tmp_path / "clips")
    datagen.write_clips_parquet(inp, 300, seed=21, rows_per_file=150)
    result = with_bucket(quality_filter(spark.read.parquet(inp)), 8)
    path = str(tmp_path / "results")
    result.write.partitionBy("bucket").parquet(path)
    return path


def test_upsert_updates_and_inserts(spark, target):
    before = spark.read.parquet(target)
    n0 = before.count()
    # updates: 20 existing rows get re-labeled + 10 brand-new clip ids
    upd_existing = (
        before.orderBy("clip_id")
        .limit(20)
        .drop("bucket")
        .withColumn("drop_reason", F.lit("requarantined"))
        .withColumn("keep", F.lit(False))
    )
    fresh = upd_existing.limit(10).withColumn(
        "clip_id", F.concat(F.lit("new_"), F.col("clip_id"))
    )
    updates = upd_existing.unionByName(fresh)
    summary = merge_upsert(spark, target, updates, n_buckets=8)
    assert summary["inserted"] == 10
    assert summary["updated"] == 20

    after = spark.read.parquet(target)
    assert after.count() == n0 + 10
    assert after.select("clip_id").distinct().count() == n0 + 10
    # updated rows took the new values
    got = after.filter(F.col("drop_reason") == "requarantined").count()
    assert got == 30  # 20 updated + 10 inserted copies


def test_upsert_prunes_untouched_buckets(spark, target):
    before = spark.read.parquet(target)
    n_before = before.count()
    one = before.filter(F.col("bucket") == before.select("bucket").first()[0])
    # materialize the update row BEFORE the merge rewrites the files its
    # lazy plan points at
    row_df = spark.createDataFrame(
        one.drop("bucket").limit(1).withColumn("scrub_edits", F.lit(999)).collect(),
        schema=one.drop("bucket").schema,
    )
    summary = merge_upsert(spark, target, row_df, n_buckets=8)
    assert len(summary["touched_buckets"]) == 1
    after = spark.read.parquet(target)
    assert after.filter(F.col("scrub_edits") == 999).count() == 1
    assert after.count() == n_before


def test_upsert_intra_batch_duplicates_deterministic(spark, target):
    """One batch, several rows per key: order_col picks the winner, counts
    collapse to distinct keys, and re-running yields the same survivor."""
    before = spark.read.parquet(target)
    n0 = before.count()
    base = before.orderBy("clip_id").limit(5).drop("bucket")
    v1 = base.withColumn("scrub_edits", F.lit(101)).withColumn(
        "dur_ms_meas", F.lit(1)
    )
    v2 = base.withColumn("scrub_edits", F.lit(202)).withColumn(
        "dur_ms_meas", F.lit(2)
    )
    updates = v1.unionByName(v2)

    summary = merge_upsert(
        spark, target, updates, n_buckets=8, order_col="dur_ms_meas"
    )
    assert summary["updated"] == 5
    assert summary["inserted"] == 0
    after = spark.read.parquet(target)
    assert after.count() == n0
    # highest order_col wins for every duplicated key
    assert after.filter(F.col("scrub_edits") == 202).count() == 5
    assert after.filter(F.col("scrub_edits") == 101).count() == 0


def test_merge_upsert_bootstraps_empty_target(spark, tmp_path):
    """First-ever batch against a path with no table yet must insert all
    rows (Iceberg MERGE's WHEN NOT MATCHED) instead of raising."""
    from wallaby2caom2_spark.operators.upsert import merge_upsert

    target = str(tmp_path / "fresh_table")
    updates = spark.createDataFrame(
        [("a", 1), ("b", 2), ("a", 3)], "clip_id string, v int"
    )
    summary = merge_upsert(spark, target, updates, n_buckets=4, order_col="v")
    assert summary["inserted"] == 2  # a deduped latest-wins, b
    assert summary["updated"] == 0
    got = {r["clip_id"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {"a": 3, "b": 2}


def test_merge_upsert_accepts_map_columns(spark, tmp_path):
    """xxhash64 rejects MapType; the content-hash tie-break must skip map
    columns instead of crashing every upsert that carries metadata maps."""
    from wallaby2caom2_spark.operators.upsert import merge_upsert

    target = str(tmp_path / "map_table")
    updates = spark.createDataFrame(
        [("a", 1, {"k": "v"}), ("b", 2, {"k": "w"})],
        "clip_id string, v int, meta map<string,string>",
    )
    summary = merge_upsert(spark, target, updates, n_buckets=4, order_col="v")
    assert summary["inserted"] == 2
    got = {r["clip_id"]: r["meta"] for r in spark.read.parquet(target).collect()}
    assert got == {"a": {"k": "v"}, "b": {"k": "w"}}


def test_supports_merge_into_false_without_lakehouse(spark, tmp_path):
    """No Iceberg/Delta jar in this container: a plain parquet catalog table
    and a nonexistent table both probe False."""
    from wallaby2caom2_spark.operators import upsert

    df = spark.createDataFrame([("a", 1)], "clip_id string, v int")
    df.write.mode("overwrite").option(
        "path", str(tmp_path / "plain_tbl")
    ).saveAsTable("plain_tbl")
    try:
        assert upsert.supports_merge_into(spark, "plain_tbl") is False
        assert upsert.supports_merge_into(spark, "no_such_table_xyz") is False
    finally:
        spark.sql("DROP TABLE IF EXISTS plain_tbl")


def test_gated_dispatch_chooses_merge_when_available(spark, monkeypatch):
    """When the provider probe says MERGE-capable, merge_upsert_auto must
    route to the MERGE INTO path with DEDUPED updates — and never touch the
    parquet fallback."""
    from wallaby2caom2_spark.operators import upsert

    calls = {}
    monkeypatch.setattr(upsert, "supports_merge_into", lambda s, t: True)

    def fake_merge(s, table, updates, key, delete_where=None):
        calls["table"] = table
        calls["keys"] = sorted(
            r["clip_id"] for r in updates.select("clip_id").collect()
        )
        calls["rows"] = {r["clip_id"]: r["v"] for r in updates.collect()}
        return {"engine": "merge_into", "table": table}

    def boom(*a, **k):
        raise AssertionError("fallback must not run when MERGE is available")

    monkeypatch.setattr(upsert, "_run_merge_into", fake_merge)
    monkeypatch.setattr(upsert, "merge_upsert", boom)

    updates = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 2)], "clip_id string, v int"
    )
    out = upsert.merge_upsert_auto(
        spark, "lake.results", updates, order_col="v"
    )
    assert out == {"engine": "merge_into", "table": "lake.results"}
    assert calls["keys"] == ["a", "b"]  # intra-batch dedup before MERGE
    assert calls["rows"] == {"a": 3, "b": 2}  # latest-wins winner


def test_gated_dispatch_falls_back_on_path_target(spark, tmp_path):
    """A path target (or a non-MERGE provider) routes to the partition-
    overwrite stand-in with identical row results."""
    from wallaby2caom2_spark.operators.upsert import merge_upsert_auto

    target = str(tmp_path / "auto_tbl")
    updates = spark.createDataFrame(
        [("a", 1), ("b", 2)], "clip_id string, v int"
    )
    out = merge_upsert_auto(spark, target, updates, n_buckets=4, order_col="v")
    assert out["engine"] == "partition_overwrite"
    assert out["inserted"] == 2
    got = {r["clip_id"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {"a": 1, "b": 2}


def test_build_merge_sql_shape():
    from wallaby2caom2_spark.operators.upsert import build_merge_sql

    sql = build_merge_sql("lake.results", "src_view", "clip_id")
    assert sql == (
        "MERGE INTO lake.results t USING src_view s "
        "ON t.clip_id = s.clip_id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_build_merge_sql_delete_arm():
    from wallaby2caom2_spark.operators.upsert import build_merge_sql

    sql = build_merge_sql(
        "lake.results", "src_view", "clip_id", delete_where="s.op = 'D'"
    )
    assert sql == (
        "MERGE INTO lake.results t USING src_view s "
        "ON t.clip_id = s.clip_id "
        "WHEN MATCHED AND (s.op = 'D') THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED AND NOT coalesce((s.op = 'D'), false) "
        "THEN INSERT *"
    )
