"""Loudness normalization operator (operators/normalize.py): gain math,
peak limiting, containment, and decode-back level verification."""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import normalize


def _sine(n: int, sr: int, amp: float, freq: float = 220.0) -> np.ndarray:
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _crest(n: int, sr: int) -> np.ndarray:
    """Low RMS but a few full-scale spikes — forces the peak limiter."""
    x = _sine(n, sr, 0.01)
    x[:: sr // 10] = 0.95
    return x


@pytest.fixture(scope="module")
def norm_rows(spark):
    rows = [
        ("quiet", audio.encode_wav(_sine(16000, 16000, 0.02), 16000), "wav", 16000),
        ("loud", audio.encode_wav(_sine(16000, 16000, 0.9), 16000), "wav", 16000),
        ("spiky", audio.encode_wav(_crest(16000, 16000), 16000), "wav", 16000),
        ("silent", audio.encode_wav(_sine(16000, 16000, 0.0), 16000), "wav", 16000),
        ("broken", b"not audio", "wav", 16000),
        # headerless raw pcm: rate must come from the declared column
        ("rawpcm", audio.encode_pcm_s16le(_sine(8000, 8000, 0.3)), "pcm_s16le", 8000),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    out = normalize.normalize_clips(df).collect()
    return {r["clip_id"]: r for r in out}


def test_every_input_gets_a_row(norm_rows):
    assert set(norm_rows) == {
        "quiet", "loud", "spiky", "silent", "broken", "rawpcm",
    }


def test_raw_pcm_uses_declared_rate(norm_rows):
    r = norm_rows["rawpcm"]
    assert r["norm_ok"] is True
    assert r["sr_out_hz"] == 8000
    assert abs(r["out_rms_dbfs"] - (-20.0)) < 0.1


def test_containment(norm_rows):
    for cid in ("silent", "broken"):
        r = norm_rows[cid]
        assert r["norm_ok"] is False
        assert r["norm_bytes"] is None


def test_rms_hits_target_within_quantization(norm_rows):
    """Both a quiet and a loud sine land on -20 dBFS after normalization
    (decode-back verification, the expected/actual fixture style)."""
    for cid in ("quiet", "loud"):
        r = norm_rows[cid]
        assert r["norm_ok"] and not r["peak_limited"]
        samples, _ = audio.decode_clip(bytes(r["norm_bytes"]), "pcm_s16le")
        rms = float(np.sqrt(np.mean(np.square(samples, dtype=np.float64))))
        assert abs(20 * np.log10(rms) - (-20.0)) < 0.1
        assert abs(r["out_rms_dbfs"] - (-20.0)) < 0.1


def test_gain_direction(norm_rows):
    assert norm_rows["quiet"]["gain_db"] > 0
    assert norm_rows["loud"]["gain_db"] < 0


def test_peak_limiter_engages_and_never_clips(norm_rows):
    r = norm_rows["spiky"]
    assert r["norm_ok"] and r["peak_limited"]
    samples, _ = audio.decode_clip(bytes(r["norm_bytes"]), "pcm_s16le")
    peak = float(np.max(np.abs(samples)))
    ceiling = 10 ** (-1.0 / 20.0)
    assert peak <= ceiling + 1e-3  # at the ceiling, not past it
    # limited gain means output RMS lands BELOW the -20 dBFS target
    assert r["out_rms_dbfs"] < -20.0


def test_deterministic_bytes(spark, norm_rows):
    rows = [
        ("quiet", audio.encode_wav(_sine(16000, 16000, 0.02), 16000), "wav", 16000)
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    again = normalize.normalize_clips(df).collect()[0]
    assert bytes(again["norm_bytes"]) == bytes(norm_rows["quiet"]["norm_bytes"])
