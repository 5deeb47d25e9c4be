"""Mains-hum gate (operators/hum.py): planted 50/60 Hz detection, family
discrimination, harmonic counting, clean-audio pass-through, containment,
operator-vs-serial equality."""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import hum


def _noise(n: int, amp: float = 0.1, seed: int = 9) -> np.ndarray:
    return (
        amp * np.random.default_rng(seed).standard_normal(n)
    ).astype(np.float32)


def _tone(f: float, n: int = 16000, sr: int = 8000, amp: float = 0.3):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_planted_50hz_is_flagged():
    x = _noise(16000) + _tone(50.0)
    hz, ratio, harm = hum.clip_hum(x, 8000)
    assert hz == 50
    assert ratio > 0.5  # the 50 Hz component dominates the power
    assert harm >= 1


def test_planted_60hz_family_wins():
    x = _noise(16000) + _tone(60.0, amp=0.2) + _tone(120.0, amp=0.15)
    hz, ratio, harm = hum.clip_hum(x, 8000)
    assert hz == 60
    assert ratio > 0.3
    assert harm >= 2  # fundamental + first harmonic both above 1% share


def test_clean_audio_passes():
    hz, ratio, _ = hum.clip_hum(_tone(440.0) + _noise(16000, amp=0.05), 8000)
    assert ratio < 0.05  # below the gate's contamination threshold


def test_silence_short_rate_and_undecodable_are_contained():
    assert hum.clip_hum(np.zeros(8000, np.float32), 8000) is None
    assert hum.clip_hum(None, 8000) is None
    assert hum.clip_hum(_noise(400), 400) is None  # rate below _MIN_SR


def test_operator_matches_serial_clip_hum(spark):
    rows = [
        ("hum50", audio.encode_wav(_noise(16000) + _tone(50.0), 8000), "wav", 8000),
        ("clean", audio.encode_wav(_tone(440.0), 8000), "wav", 8000),
        ("sil", audio.encode_wav(np.zeros(8000, np.float32), 8000), "wav", 8000),
        ("broken", b"xx", "wav", 8000),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    out = {r["clip_id"]: r for r in hum.hum_stats(df).collect()}
    for cid, raw, codec, sr_decl in rows:
        samples, sr_meas = audio.decode_clip(raw, codec)
        sr = sr_meas or audio.declared_sr(sr_decl)
        res = hum.clip_hum(samples, sr)
        got = out[cid]
        if res is None:
            assert not got["hum_ok"]
        else:
            assert got["hum_ok"]
            assert (got["hum_hz"], got["hum_ratio"], got["hum_harmonics"]) == res
