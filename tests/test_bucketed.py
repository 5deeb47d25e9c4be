"""Bucketed-layout co-located joins (sources/bucketed.py): the join of two
tables bucketed on the same key plans with ZERO Exchange operators, and the
results match a plain shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wallaby2caom2_spark.sources import bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    left = spark.range(0, 2000).select(
        F.concat(F.lit("clip-"), F.col("id")).alias("clip_id"),
        (F.col("id") % 97).alias("score"),
    )
    right = spark.range(0, 1500).select(
        F.concat(F.lit("clip-"), F.col("id")).alias("clip_id"),
        (F.col("id") % 13).alias("mtime"),
    )
    bucketed.write_bucketed(left, "bt_left", n_buckets=8, path=f"{wh}/bt_left")
    bucketed.write_bucketed(
        right, "bt_right", n_buckets=8, path=f"{wh}/bt_right"
    )
    yield "bt_left", "bt_right"
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    lt, rt = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed.colocated_join(spark, lt, rt)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # the whole point of the layout
        assert joined.count() == 1500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_matches_shuffled_join(spark, bucketed_pair):
    lt, rt = bucketed_pair
    co = {
        (r["clip_id"], r["score"], r["mtime"])
        for r in bucketed.colocated_join(spark, lt, rt).collect()
    }
    plain = {
        (r["clip_id"], r["score"], r["mtime"])
        for r in spark.table(lt).join(spark.table(rt), "clip_id").collect()
    }
    assert co == plain and len(co) == 1500
