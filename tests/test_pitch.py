"""F0 tracker (operators/pitch.py): tone accuracy, voicing decisions,
octave-error guard, containment, operator-vs-serial equality."""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import pitch


def _tone(freq: float, sr: int = 16000, sec: float = 1.0, amp: float = 0.5):
    t = np.arange(int(sr * sec)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_tone_f0_within_lag_quantization():
    """An 8 kHz lag grid quantizes F0 to 8000/lag — the estimate must land
    within one lag step of the true frequency, with no octave errors."""
    for true_f0 in (75.0, 120.0, 200.0, 400.0):
        res = pitch.clip_pitch(_tone(true_f0), 16000)
        assert res is not None
        n_frames, n_voiced, ratio, f0 = res
        assert ratio == 1.0, true_f0
        true_lag = 8000.0 / true_f0
        lo = 8000.0 / (true_lag + 1.5)
        hi = 8000.0 / max(true_lag - 1.5, 1.0)
        assert lo <= f0 <= hi, (true_f0, f0)


def test_noise_and_silence_are_unvoiced():
    rng = np.random.default_rng(7)
    noise = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    for x in (noise, np.zeros(16000, dtype=np.float32)):
        res = pitch.clip_pitch(x, 16000)
        assert res is not None
        assert res[1] == 0 and res[3] == 0.0


def test_modulated_voice_like_signal_is_mostly_voiced():
    sr = 16000
    t = np.arange(sr) / sr
    x = (
        0.4
        * np.sign(np.sin(2 * np.pi * 120 * t))
        * np.abs(np.sin(2 * np.pi * 3 * t))
    ).astype(np.float32)
    res = pitch.clip_pitch(x, sr)
    assert res[2] > 0.9
    assert 105.0 <= res[3] <= 135.0  # no octave-down (60) or -up (240)


def test_too_short_and_undecodable_are_none():
    assert pitch.clip_pitch(None, 16000) is None
    assert pitch.clip_pitch(_tone(200.0, sec=0.01), 16000) is None
    assert pitch.clip_pitch(_tone(200.0), 0) is None


@pytest.fixture(scope="module")
def pitch_rows(spark):
    rows = [
        ("t200", audio.encode_wav(_tone(200.0), 16000), "wav", 16000),
        ("t75", audio.encode_wav(_tone(75.0), 16000), "wav", 16000),
        ("sil", audio.encode_wav(np.zeros(16000, np.float32), 16000), "wav", 16000),
        ("broken", b"xx", "wav", 16000),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    return rows, {r["clip_id"]: r for r in pitch.pitch_stats(df).collect()}


def test_operator_matches_serial_clip_pitch(pitch_rows):
    rows, out = pitch_rows
    for cid, raw, codec, sr_decl in rows:
        samples, sr_meas = audio.decode_clip(raw, codec)
        sr = sr_meas or audio.declared_sr(sr_decl)
        res = pitch.clip_pitch(samples, sr)
        r = out[cid]
        if res is None:
            assert not r["pitch_ok"]
            assert r["n_frames"] == 0 and r["mean_f0"] == 0.0
        else:
            assert r["pitch_ok"]
            assert (
                r["n_frames"],
                r["n_voiced"],
                r["voiced_ratio"],
                r["mean_f0"],
            ) == res


def test_voicing_separates_tone_from_silence(pitch_rows):
    _, out = pitch_rows
    assert out["t200"]["voiced_ratio"] == 1.0
    assert out["sil"]["n_voiced"] == 0
    assert not out["broken"]["pitch_ok"]
