"""Spectral-flux onset detector (operators/onset.py): a planted burst train
is recovered at its rate, steady content produces almost nothing, silence is
static, and the adaptive threshold makes the count gain-invariant."""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators.onset import clip_onset, onset_stats

SR = 16000


def _burst_train(rate_hz: float, dur_s: float, gain: float, seed: int = 5):
    rng = np.random.default_rng(seed)
    n = int(SR * dur_s)
    x = (0.005 * rng.standard_normal(n)).astype(np.float32)
    period = int(SR / rate_hz)
    blen = SR // 100  # 10 ms bursts
    for start in range(period // 2, n - blen, period):
        x[start : start + blen] += (
            gain * rng.standard_normal(blen)
        ).astype(np.float32)
    return x.clip(-1, 1)


def test_burst_rate_recovered():
    x = _burst_train(5.0, 2.0, 0.5)
    n_frames, n_onsets, rate, flux_mean = clip_onset(x, SR)
    assert abs(rate - 5.0) <= 1.0, rate
    assert flux_mean > 0.0


def test_steady_and_silent_content():
    t = np.arange(SR, dtype=np.float64) / SR
    sine = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    _, sine_onsets, sine_rate, _ = clip_onset(sine, SR)
    _, click_onsets, click_rate, _ = clip_onset(_burst_train(5.0, 1.0, 0.5), SR)
    assert click_rate > 3.0 * max(sine_rate, 0.1)
    silence = np.zeros(SR, dtype=np.float32)
    _, n_onsets, rate, flux_mean = clip_onset(silence, SR)
    assert (n_onsets, rate, flux_mean) == (0, 0.0, 0.0)


def test_gain_invariant_counts():
    # flux and its mean+k*std threshold both scale linearly with gain —
    # the detected onset set must be identical (clipping avoided: ≤0.05)
    loud = _burst_train(4.0, 1.5, 0.05, seed=9)
    quiet = (loud * 0.01).astype(np.float32)
    nf_l, n_l, r_l, _ = clip_onset(loud, SR)
    nf_q, n_q, r_q, _ = clip_onset(quiet, SR)
    assert (nf_l, n_l) == (nf_q, n_q)
    assert r_l == r_q


def test_containment_rows(spark):
    df = spark.createDataFrame(
        [
            ("bad", bytearray(b"notwav"), SR, 100, "wav", ""),
            (
                "ok",
                bytearray(audio.encode_wav(_burst_train(5.0, 1.0, 0.5), SR)),
                SR,
                1000,
                "wav",
                "",
            ),
        ],
        schema=(
            "clip_id string, bytes binary, sr_hz int, dur_ms int, "
            "codec string, transcript string"
        ),
    )
    by = {r["clip_id"]: r for r in onset_stats(df).collect()}
    assert by["bad"]["on_ok"] is False
    assert by["bad"]["on_onsets"] == 0
    assert by["ok"]["on_ok"] is True
    assert by["ok"]["on_onsets"] >= 3
