"""Pair/row-level pins for the shards family (queries/shards.py): the
aggregate outputs are oracle-checked by the driver gate; these assert the
SPECIFIC planted facts the aggregates summarize."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from wallaby2caom2_spark.operators import audio_fp
from wallaby2caom2_spark.queries import shards
from wallaby2caom2_spark.queries.clips_flagship import load_clips

SF = "/root/testdata/sf0.001"


def _md5_head(clip_id: str) -> int:
    return int(hashlib.md5(clip_id.encode()).hexdigest()[:4], 16)


@pytest.fixture(scope="module")
def clip_rows(spark):
    return {
        r["clip_id"]: r
        for r in load_clips(spark, SF)
        .select("clip_id", "transcript")
        .collect()
    }


def test_incremental_dedup_finds_every_planted_redelivery(spark):
    """Every 'ingest-' clip is byte-identical to a store clip, so — when it
    is fingerprintable at all — the probe must report it as a dup at
    hamming 0. Novel + dup + unfingerprintable partition the batch."""
    clips = load_clips(spark, SF)
    h = shards._md5_head()
    existing = clips.filter(h % 2 == 0)
    redelivered = clips.filter(h % 16 == 0).withColumn(
        "clip_id", F.concat(F.lit("ingest-"), F.col("clip_id"))
    )
    batch = clips.filter(h % 2 == 1).unionByName(redelivered)
    store_fp = audio_fp.with_fingerprint(existing).select(
        "clip_id", "fp_ok", "fp"
    )
    batch_fp = audio_fp.with_fingerprint(batch).select(
        "clip_id", "fp_ok", "fp"
    )
    best = {
        r["clip_id"]: (r["match_id"], r["hamming"])
        for r in audio_fp.incremental_matches(batch_fp, store_fp).collect()
    }
    fp_rows = batch_fp.collect()
    planted = [
        r for r in fp_rows if r["clip_id"].startswith("ingest-") and r["fp_ok"]
    ]
    assert planted, "fixture produced no fingerprintable redeliveries"
    for r in planted:
        assert r["clip_id"] in best, r["clip_id"]
        assert best[r["clip_id"]][1] == 0, (r["clip_id"], best[r["clip_id"]])
    # summary partitions the batch exactly
    result = shards.audio_incremental_dedup(spark, SF).collect()
    assert sum(x["n_clips"] for x in result) == len(fp_rows)
    statuses = {x["status"] for x in result}
    assert statuses <= {"dup", "novel", "unfingerprintable"}
    dup_n = sum(x["n_clips"] for x in result if x["status"] == "dup")
    assert dup_n >= len(planted)


def test_crossmodal_planted_pairs_classified(spark, clip_rows):
    """Each planted redelivery class lands in its class: byte-identical +
    same transcript → both; byte-identical + replaced transcript →
    audio_only; undecodable copy + same transcript → text_only."""
    pairs = {
        (r["clip_a"], r["clip_b"]): r["dup_class"]
        for r in shards.crossmodal_pair_table(spark, SF).collect()
    }

    def pair_of(orig, prefix):
        a, b = sorted([orig, f"{prefix}-{orig}"])
        return (a, b)

    # fingerprintability per original clip (undecodable originals cannot
    # form the audio side of a pair)
    from wallaby2caom2_spark.queries.clips_flagship import features_path_for

    import duckdb

    fx = duckdb.sql(
        f"SELECT clip_id, fp_ok FROM "
        f"read_parquet('{features_path_for(SF)}/*.parquet')"
    ).fetchall()
    fp_ok = dict(fx)

    n_checked = {"both": 0, "audio_only": 0, "text_only": 0}
    for cid in clip_rows:
        m = _md5_head(cid) % 24
        if m == 1 and fp_ok.get(cid):
            assert pairs.get(pair_of(cid, "dupb")) == "both", cid
            n_checked["both"] += 1
        elif m == 2 and fp_ok.get(cid):
            assert pairs.get(pair_of(cid, "dupa")) == "audio_only", cid
            n_checked["audio_only"] += 1
        elif m == 3:
            assert pairs.get(pair_of(cid, "dupt")) == "text_only", cid
            n_checked["text_only"] += 1
    assert all(v > 0 for v in n_checked.values()), n_checked


def test_shard_packing_covers_all_kept_clips(spark):
    """The shard summary accounts for every kept clip and every kept
    millisecond exactly once (no clip dropped or double-assigned by the
    offset rule)."""
    from wallaby2caom2_spark.plans.pipeline import quality_filter

    kept = (
        quality_filter(load_clips(spark, SF))
        .filter(F.col("keep"))
        .agg(
            F.count("*").alias("n"),
            F.sum("dur_ms_meas").cast("long").alias("ms"),
        )
        .collect()[0]
    )
    summary = shards.clips_shard_packing(spark, SF).collect()
    assert sum(r["n_clips"] for r in summary) == kept["n"]
    assert sum(r["total_ms"] for r in summary) == kept["ms"]
