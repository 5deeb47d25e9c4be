"""Filterbank feature extraction (operators/features.py): frame math, band
energy localization, tensor round-trip, containment, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import features


def _sine(n: int, sr: int, freq: float, amp: float = 0.5) -> np.ndarray:
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture(scope="module")
def feat_rows(spark):
    rows = [
        # 1.0 s @ 16 kHz, 500 Hz tone → low band
        ("low", audio.encode_wav(_sine(16000, 16000, 500.0), 16000), "wav", 16000),
        # 7 kHz tone → top band
        ("high", audio.encode_wav(_sine(16000, 16000, 7000.0), 16000), "wav", 16000),
        # shorter than one 25 ms frame → zero frames, feat_ok=false
        ("tiny", audio.encode_wav(_sine(200, 16000, 500.0), 16000), "wav", 16000),
        ("broken", b"xx", "wav", 16000),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    return {r["clip_id"]: r for r in features.feature_frames(df).collect()}


def test_frame_count_math(feat_rows):
    # 16000 samples, win=400, hop=160 → 1 + (16000-400)//160 = 98
    assert feat_rows["low"]["n_frames"] == 98
    assert feat_rows["low"]["n_bands"] == 12


def test_tensor_roundtrip_shape(feat_rows):
    r = feat_rows["low"]
    feats = np.frombuffer(bytes(r["feat_bytes"]), dtype=np.float32).reshape(
        r["n_frames"], r["n_bands"]
    )
    assert feats.shape == (98, 12)
    assert np.isfinite(feats).all()


def test_band_energy_localization(feat_rows):
    """A pure tone's energy lands in the expected equal-width band:
    bands split [0, 8 kHz) into 12 → 500 Hz → band 0, 7 kHz → band 10."""
    for cid, expect_band in (("low", 0), ("high", 10)):
        r = feat_rows[cid]
        feats = np.frombuffer(bytes(r["feat_bytes"]), dtype=np.float32).reshape(
            r["n_frames"], r["n_bands"]
        )
        assert int(np.argmax(feats.mean(axis=0))) == expect_band


def test_containment(feat_rows):
    for cid in ("tiny", "broken"):
        assert feat_rows[cid]["feat_ok"] is False
        assert feat_rows[cid]["n_frames"] == 0
        assert feat_rows[cid]["feat_bytes"] is None


def test_deterministic(spark, feat_rows):
    rows = [("low", audio.encode_wav(_sine(16000, 16000, 500.0), 16000), "wav", 16000)]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    again = features.feature_frames(df).collect()[0]
    assert bytes(again["feat_bytes"]) == bytes(feat_rows["low"]["feat_bytes"])
    assert again["mean_log_energy"] == feat_rows["low"]["mean_log_energy"]
