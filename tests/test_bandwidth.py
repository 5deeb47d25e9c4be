"""Bandwidth gate (operators/bandwidth.py): rolloff localization, suspect
flagging, containment, operator-vs-serial equality."""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import bandwidth


def _noise(n: int, amp: float = 0.2, seed: int = 3) -> np.ndarray:
    return (
        amp * np.random.default_rng(seed).standard_normal(n)
    ).astype(np.float32)


def test_wideband_noise_fills_the_band():
    res = bandwidth.clip_bandwidth(_noise(16000), 16000)
    r95, r99, ratio, suspect = res
    assert ratio > 0.85 and not suspect
    assert r99 > r95


def test_upsampled_content_reads_band_limited():
    """8 kHz noise linearly upsampled to 16 kHz: content sits below ~5 kHz
    (linear interp leaves imaging energy, so the ratio lands between a
    brick-wall 0.5 and full band — still clearly below wideband)."""
    low = _noise(8000)
    up = audio.resample_linear(low, 8000, 16000)
    _, _, ratio_up, _ = bandwidth.clip_bandwidth(up, 16000)
    _, _, ratio_wide, _ = bandwidth.clip_bandwidth(_noise(16000), 16000)
    assert ratio_up < ratio_wide - 0.2


def test_tone_is_upsample_suspect():
    t = np.arange(16000) / 16000
    tone = (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    r95, _, ratio, suspect = bandwidth.clip_bandwidth(tone, 16000)
    assert suspect and ratio < 0.1
    assert 250.0 <= r95 <= 400.0  # rolloff localizes the tone


def test_silence_and_short_are_contained():
    assert bandwidth.clip_bandwidth(np.zeros(16000, np.float32), 16000) is None
    assert bandwidth.clip_bandwidth(_noise(50), 16000) is None
    assert bandwidth.clip_bandwidth(None, 16000) is None


@pytest.fixture(scope="module")
def bw_rows(spark):
    t = np.arange(16000) / 16000
    rows = [
        ("wide", audio.encode_wav(_noise(16000), 16000), "wav", 16000),
        (
            "tone",
            audio.encode_wav(
                (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32), 16000
            ),
            "wav",
            16000,
        ),
        ("sil", audio.encode_wav(np.zeros(16000, np.float32), 16000), "wav", 16000),
        ("broken", b"xx", "wav", 16000),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    return rows, {
        r["clip_id"]: r for r in bandwidth.bandwidth_stats(df).collect()
    }


def test_operator_matches_serial_clip_bandwidth(bw_rows):
    rows, out = bw_rows
    for cid, raw, codec, sr_decl in rows:
        samples, sr_meas = audio.decode_clip(raw, codec)
        sr = sr_meas or audio.declared_sr(sr_decl)
        res = bandwidth.clip_bandwidth(samples, sr)
        r = out[cid]
        if res is None:
            assert not r["bw_ok"] and r["bw_ratio"] == 0.0
        else:
            assert r["bw_ok"]
            assert (
                r["rolloff95_hz"],
                r["rolloff99_hz"],
                r["bw_ratio"],
                r["upsample_suspect"],
            ) == res


def test_gate_separates_wide_from_tone(bw_rows):
    _, out = bw_rows
    assert not out["wide"]["upsample_suspect"]
    assert out["tone"]["upsample_suspect"]
    assert not out["sil"]["bw_ok"] and not out["broken"]["bw_ok"]
