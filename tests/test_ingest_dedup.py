"""Continuous-ingest content dedup (streaming/ingest_dedup.py): the
signature table spans runs, planted cross-run redeliveries triage as
dup_of_store, same-batch copies as dup_in_batch, and a retried batch
never matches its own failed append."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from wallaby2caom2_spark import datagen
from wallaby2caom2_spark.streaming.ingest_dedup import (
    dedup_batch,
    run_ingest_dedup_stream,
)


def _reprefix(table: pa.Table, prefix: str) -> pa.Table:
    ids = pa.array([f"{prefix}{v.as_py()}" for v in table["clip_id"]])
    return table.set_column(
        table.schema.get_field_index("clip_id"), "clip_id", ids
    )


@pytest.fixture(scope="module")
def ingest_run(spark, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("ingest"))
    inp = os.path.join(work, "in")
    out = os.path.join(work, "out")
    os.makedirs(inp)
    # wave 1: 120 clips
    pq.write_table(
        datagen.generate_table(120, seed=5),
        os.path.join(inp, "wave1.parquet"),
    )
    run_ingest_dedup_stream(spark, inp, out)

    # wave 2: 60 brand-new clips + 30 redelivered wave-1 clips under fresh
    # ids + an intra-batch copy pair (two fresh ids, same content)
    fresh = datagen.generate_table(60, seed=5, start=120)
    redelivered = _reprefix(
        datagen.generate_table(30, seed=5, start=0), "redeliver-"
    )
    dup_a = _reprefix(datagen.generate_table(1, seed=5, start=50), "batchdupA-")
    dup_b = _reprefix(datagen.generate_table(1, seed=5, start=50), "batchdupB-")
    # start=50 clip is already in the store too — but the STORE match wins
    # in the status cascade, so plant the pure intra-batch case with
    # content the store has never seen (start=200, outside both waves)
    only_a = _reprefix(datagen.generate_table(1, seed=5, start=200), "onlyA-")
    only_b = _reprefix(datagen.generate_table(1, seed=5, start=200), "onlyB-")
    wave2 = pa.concat_tables(
        [fresh, redelivered, dup_a, dup_b, only_a, only_b]
    )
    pq.write_table(wave2, os.path.join(inp, "wave2.parquet"))
    run_ingest_dedup_stream(spark, inp, out)
    return inp, out, wave2


def test_cross_run_redeliveries_triage_as_store_dups(spark, ingest_run):
    _, out, _ = ingest_run
    triage = spark.read.parquet(os.path.join(out, "triage"))
    batches = sorted(
        r["batch_id"] for r in triage.select("batch_id").distinct().collect()
    )
    assert len(batches) == 2
    # wave-2 batch: every fingerprintable redelivered clip is dup_of_store.
    # Re-derive per-clip statuses via the batch function (same plan the
    # sink ran) to assert clip-level facts the summary aggregates away.
    sig_path = os.path.join(out, "signatures")
    wave2_df = spark.read.parquet(
        os.path.join(ingest_run[0], "wave2.parquet")
    )
    per_clip = {
        r["clip_id"]: r
        for r in dedup_batch(
            spark, wave2_df, batches[1], sig_path
        ).collect()
    }
    redelivered = [
        r for c, r in per_clip.items() if c.startswith("redeliver-")
    ]
    fingerprintable = [r for r in redelivered if r["fp_ok"]]
    assert fingerprintable, "no fingerprintable redelivery planted"
    for r in fingerprintable:
        assert r["status"] == "dup_of_store", r
        assert r["hamming"] == 0, r


def test_intra_batch_copies_elect_one_keeper(spark, ingest_run):
    inp, out, _ = ingest_run
    sig_path = os.path.join(out, "signatures")
    wave2_df = spark.read.parquet(os.path.join(inp, "wave2.parquet"))
    per_clip = {
        r["clip_id"]: r
        for r in dedup_batch(spark, wave2_df, 1, sig_path).collect()
    }
    a, b = per_clip["onlyA-clip_0000000200"], per_clip["onlyB-clip_0000000200"]
    if a["fp_ok"]:  # content may be undecodable by seed chance
        assert a["status"] == "novel", a  # min-id keeper
        assert b["status"] == "dup_in_batch", b
        assert b["match_id"] == "onlyA-clip_0000000200", b


def test_signature_table_holds_exactly_the_novel_set(spark, ingest_run):
    _, out, _ = ingest_run
    sigs = spark.read.parquet(os.path.join(out, "signatures"))
    triage = spark.read.parquet(os.path.join(out, "triage"))
    novel_total = (
        triage.filter(F.col("status") == "novel")
        .agg(F.sum("n_clips"))
        .collect()[0][0]
    )
    assert sigs.count() == novel_total
    assert sigs.select("clip_id").distinct().count() == novel_total


def test_retry_does_not_match_its_own_append(spark, ingest_run):
    """Re-running the batch function with the SAME batch_id (the retry
    case) must exclude the batch's own signature partition from the store
    — otherwise every previously-novel clip would match itself and flip
    to dup_of_store."""
    inp, out, _ = ingest_run
    sig_path = os.path.join(out, "signatures")
    wave2_df = spark.read.parquet(os.path.join(inp, "wave2.parquet"))
    retry = {
        r["clip_id"]: r["status"]
        for r in dedup_batch(spark, wave2_df, 1, sig_path).collect()
    }
    sigs_b1 = {
        r["clip_id"]
        for r in spark.read.parquet(sig_path)
        .filter("batch_id = 1")
        .collect()
    }
    assert sigs_b1, "wave-2 appended no signatures"
    for cid in sigs_b1:
        assert retry[cid] == "novel", (cid, retry[cid])
