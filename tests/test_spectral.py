"""Spectral tonality gate (operators/spectral.py): a pure sine must read as
tonal, white noise as broadband, silence as no-signal — at any gain."""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import spectral

SR = 16000


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (cid, bytearray(audio.encode_wav(sig, SR)), SR, 500, "wav", "")
            for cid, sig in rows
        ],
        schema="clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )


def _collect(spark, rows):
    out = spectral.classify_tonality(spectral.spectral_stats(_df(spark, rows)))
    return {r["clip_id"]: r for r in out.collect()}


def test_sine_noise_silence_classes(spark):
    rng = np.random.default_rng(3)
    t = np.arange(SR, dtype=np.float64) / SR
    sine = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    quiet_sine = (0.01 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    noise = (0.3 * rng.standard_normal(SR)).astype(np.float32).clip(-1, 1)
    silence = np.zeros(SR, dtype=np.float32)
    by = _collect(
        spark,
        [("sine", sine), ("quiet", quiet_sine), ("noise", noise), ("sil", silence)],
    )
    assert by["sine"]["tonality"] == "tonal_artifact"
    # gain-invariance: a quiet tone is still a tone
    assert by["quiet"]["tonality"] == "tonal_artifact"
    assert by["noise"]["tonality"] == "broadband"
    assert by["sil"]["tonality"] == "no_signal"
    assert by["sine"]["flatness"] < 0.05 < by["noise"]["flatness"]
    assert by["sine"]["peak_share"] > 0.5 > by["noise"]["peak_share"]


def test_centroid_tracks_tone_frequency(spark):
    t = np.arange(SR, dtype=np.float64) / SR
    lo = (0.4 * np.sin(2 * np.pi * 200.0 * t)).astype(np.float32)
    hi = (0.4 * np.sin(2 * np.pi * 1500.0 * t)).astype(np.float32)
    by = _collect(spark, [("lo", lo), ("hi", hi)])
    assert by["lo"]["centroid_hz"] == pytest.approx(200.0, abs=40.0)
    assert by["hi"]["centroid_hz"] == pytest.approx(1500.0, abs=80.0)


def test_absurd_declared_rate_is_contained(spark):
    """A parseable WAV header may declare ANY nonzero rate; sr=20 Hz used to
    round hop to zero and crash the whole batch — it must emit a
    containment row instead."""
    sig = np.zeros(400, dtype=np.float32)
    sig[::3] = 0.5
    df = spark.createDataFrame(
        [("w", bytearray(audio.encode_wav(sig, 20)), 20, 100, "wav", "")],
        schema="clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )
    rows = spectral.spectral_stats(df).collect()
    assert len(rows) == 1 and not rows[0]["spec_ok"]


def test_containment_rows(spark):
    """Truncated payload and too-short clip emit spec_ok=false, not errors."""
    good = (0.3 * np.sin(2 * np.pi * 300.0 * np.arange(SR) / SR)).astype(
        np.float32
    )
    rows = [
        ("trunc", None),
        ("short", np.zeros(8, dtype=np.float32)),
        ("good", good),
    ]
    df = spark.createDataFrame(
        [
            (
                cid,
                bytearray(audio.encode_wav(sig, SR)) if sig is not None else None,
                SR,
                100,
                "wav",
                "",
            )
            for cid, sig in rows
        ],
        schema="clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )
    by = {r["clip_id"]: r for r in spectral.spectral_stats(df).collect()}
    assert not by["trunc"]["spec_ok"] and not by["short"]["spec_ok"]
    assert by["good"]["spec_ok"]
