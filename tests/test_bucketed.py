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


def test_bucketed_payload_attach_exchanges_only_the_id_side(spark, tmp_path):
    """The curation DAG's final-survivor attach (plans/curate.py): with the
    payload table bucketed on clip_id, the semi-join against an arbitrary
    (un-bucketed, un-broadcastable) id frame must plan the Exchange ONLY on
    the slim id side — the payload scan reads its buckets in place and the
    ``bytes`` column never enters an exchange."""
    import re

    from wallaby2caom2_spark import datagen

    pdf = datagen.generate_table(200, seed=11).to_pandas()
    clips = spark.createDataFrame(
        pdf,
        schema="clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    bucketed.write_bucketed(
        clips, "bt_clips", n_buckets=4, path=str(tmp_path / "bt_clips")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ids = spark.range(0, 10_000).select(
            F.format_string("clip_%010d", F.col("id")).alias("clip_id")
        )
        joined = spark.table("bt_clips").join(ids, "clip_id", "left_semi")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan  # the id side only
        # no Exchange input anywhere in the plan carries the payload column
        for line in plan.splitlines():
            if "Exchange" in line:
                assert not re.search(r"\bbytes#\d+", line), line
        # datagen salts a fraction of ids with a hot_ prefix; the id frame
        # covers exactly the plain clip_<n> space
        expect = spark.table("bt_clips").filter(
            ~F.col("clip_id").startswith("hot_")
        ).count()
        assert 0 < expect
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bt_clips")


def test_curate_corpus_accepts_bucketed_clips_table(spark, tmp_path):
    """curate_corpus(clips_table=...) must produce the identical manifest as
    the plain path read — the bucketed layout changes the PLAN of the
    survivor attach, never the rows."""
    from wallaby2caom2_spark import datagen
    from wallaby2caom2_spark.plans.curate import curate_corpus

    inp = str(tmp_path / "clips")
    datagen.write_clips_parquet(inp, 150, seed=9, rows_per_file=75)
    clips = spark.read.parquet(inp)
    bucketed.write_bucketed(
        clips, "bt_curate", n_buckets=4, path=str(tmp_path / "bt_curate")
    )
    try:
        m_path = curate_corpus(
            spark, inp, str(tmp_path / "out_path"), n_buckets=2
        )
        m_bucket = curate_corpus(
            spark,
            inp,
            str(tmp_path / "out_bucket"),
            n_buckets=2,
            clips_table="bt_curate",
        )
        assert m_path == m_bucket
        assert m_bucket["n_clips"] > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_curate")


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
