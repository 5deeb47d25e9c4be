"""Measured-execution audit (observe.py): the byte-shuffle contract and
the no-spill claim, proven from Spark's own task metrics rather than plan
text. Companion to tests/test_plan_shapes.py — that file pins what the
plan SAYS, this one pins what the run DID."""

from __future__ import annotations

from pyspark.sql import functions as F

from wallaby2caom2_spark.observe import StageMetricsAudit, stage_snapshot
from wallaby2caom2_spark.queries.clips_flagship import (
    clips_quality_filter,
    load_clips,
)

SF = "/root/testdata/sf0.001"


def test_audit_deltas_only_the_inner_stages(spark):
    # warm-up job OUTSIDE the audit must not be counted
    spark.range(0, 10000).groupBy((F.col("id") % 3).alias("k")).count().collect()
    with StageMetricsAudit(spark) as a:
        spark.range(0, 1000).selectExpr("id % 5 AS k", "id AS v").groupBy(
            "k"
        ).sum("v").collect()
    assert a.totals["num_failed_tasks"] == 0
    assert a.totals["shuffle_write_bytes"] > 0
    assert a.totals["shuffle_write_bytes"] == a.totals["shuffle_read_bytes"]
    # every audited stage is one of the inner job's (delta, not snapshot)
    before_ids = {s["stage_id"] for s in a.stages}
    assert len(before_ids) >= 2  # map + reduce at minimum
    # and the snapshot helper sees at least those stages
    assert set((s["stage_id"], s["attempt_id"]) for s in a.stages) <= set(
        stage_snapshot(spark)
    )


def test_flagship_measured_shuffle_is_slim_and_spill_free(spark):
    """THE dynamic contract: running the full quality-filter pipeline on
    ~93 MB of audio payload shuffles under 1 MB (slim feature columns
    only — the bytes died in the scan-side worker) and spills nothing.
    A payload-width regression anywhere in the plan moves this by two
    orders of magnitude."""
    clips = load_clips(spark, SF)
    payload = clips.agg(
        F.sum(F.length("bytes")).alias("b")
    ).collect()[0]["b"]
    assert payload > 50_000_000  # the fixture really is full audio
    with StageMetricsAudit(spark) as a:
        rows = clips_quality_filter(spark, SF).collect()
    assert len(rows) == 2000
    s = a.summary(payload_bytes=payload)
    assert s["num_failed_tasks"] == 0
    assert s["memory_spill_bytes"] == 0 and s["disk_spill_bytes"] == 0
    assert s["shuffle_write_bytes"] < 1_000_000, s
    assert s["shuffle_write_per_payload_permille"] <= 5, s


def test_audit_detects_a_payload_shuffle(spark):
    """Guard against a vacuous instrument: a plan that DOES repartition
    the payload column must register payload-scale shuffle bytes."""
    clips = load_clips(spark, SF)
    payload = clips.agg(
        F.sum(F.length("bytes")).alias("b")
    ).collect()[0]["b"]
    with StageMetricsAudit(spark) as a:
        clips.repartition(8).agg(F.sum(F.length("bytes"))).collect()
    s = a.summary(payload_bytes=payload)
    assert s["shuffle_write_bytes"] > payload // 2, s
    assert s["shuffle_write_per_payload_permille"] >= 500, s
