"""Declip repair (operators/declip.py): a clipped sine's saturated runs are
re-drawn above the ceiling toward the true peak, clean audio is untouched,
boundary runs are left alone, and the report numbers are exact."""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators.declip import (
    _CLIP_T,
    _saturated_runs,
    clip_declip,
    declip_stats,
)

SR = 16000


def _clipped_sine(gain: float, f: float = 220.0, dur_s: float = 0.5):
    """A sine that would peak at ``gain`` (>1 → hard-clipped on encode)."""
    t = np.arange(int(SR * dur_s), dtype=np.float64) / SR
    x = (gain * np.sin(2 * np.pi * f * t)).astype(np.float32)
    wav = audio.encode_wav(x, SR)  # encoder clips to the int16 ceiling
    x16, sr = audio.decode_clip_i16(wav, "wav")
    return x16, sr


def test_clean_audio_untouched():
    t = np.arange(SR // 2, dtype=np.float64) / SR
    x = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    x16, sr = audio.decode_clip_i16(audio.encode_wav(x, SR), "wav")
    n_runs, n_samp, frac, energy_db, peak = clip_declip(x16, sr)
    assert (n_runs, n_samp, frac) == (0, 0, 0.0)
    assert energy_db == 0.0
    assert 0.49 < peak < 0.51


def test_clipped_sine_repaired_toward_true_peak():
    x16, sr = _clipped_sine(1.3)
    sat = int(np.count_nonzero((x16 >= _CLIP_T) | (x16 <= -_CLIP_T)))
    n_runs, n_samp, frac, energy_db, peak = clip_declip(x16, sr)
    assert n_runs > 0
    # every interior saturated run is repaired (a 220 Hz sine at 16 kHz
    # saturates in long runs, none of which touch the clip boundary here)
    assert n_samp >= 0.9 * sat
    # the Hermite bulge reaches ABOVE the ceiling toward the true 1.3 peak
    assert 1.05 < peak < 1.6
    # reconstruction ADDS energy (the flat top had less than the true arc)
    assert energy_db > 0.1
    assert frac == n_samp / len(x16)


def test_boundary_run_is_skipped():
    x16 = np.full(100, 32767, dtype=np.int16)  # fully saturated clip
    n_runs, n_samp, frac, energy_db, peak = clip_declip(x16, SR)
    assert (n_runs, n_samp) == (0, 0)  # no clean anchors → left as-is
    assert _saturated_runs(x16) == []


def test_stats_operator_and_containment(spark):
    x16, _ = _clipped_sine(1.3)
    clean = (0.3 * np.sin(2 * np.pi * 330.0 * np.arange(SR) / SR)).astype(
        np.float32
    )
    df = spark.createDataFrame(
        [
            ("clipped", bytearray(audio.encode_wav(
                x16.astype(np.float32) / 32767.0, SR)), SR, 500, "wav", ""),
            ("clean", bytearray(audio.encode_wav(clean, SR)), SR, 1000, "wav", ""),
            ("bad", bytearray(b"junk"), SR, 100, "wav", ""),
        ],
        schema=(
            "clip_id string, bytes binary, sr_hz int, dur_ms int, "
            "codec string, transcript string"
        ),
    )
    by = {r["clip_id"]: r for r in declip_stats(df).collect()}
    assert by["clipped"]["dcl_ok"] and by["clipped"]["dcl_runs"] > 0
    assert by["clean"]["dcl_ok"] and by["clean"]["dcl_runs"] == 0
    assert by["bad"]["dcl_ok"] is False
