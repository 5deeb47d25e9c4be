"""Reverb gate (operators/reverb.py): decay-slope accuracy on synthetic
exponential tails, no-decay sentinel, containment, operator-vs-serial
equality."""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import reverb


def _noise(n: int, amp: float = 0.3, seed: int = 5) -> np.ndarray:
    return (
        amp * np.random.default_rng(seed).standard_normal(n)
    ).astype(np.float32)


def _decaying(rt60_s: float, sr: int = 16000, dur_s: float = 2.0) -> np.ndarray:
    """Noise burst whose dB envelope falls exactly 60/rt60 dB per second."""
    t = np.arange(int(sr * dur_s)) / sr
    env = 10.0 ** (-3.0 * t / rt60_s)  # -60 dB after rt60_s seconds
    return (_noise(len(t)) * env).astype(np.float32)


def test_known_decay_is_recovered():
    for rt60_s in (0.3, 0.6, 1.2):
        res = reverb.clip_reverb(_decaying(rt60_s), 16000)
        assert res is not None
        slope, rt60_ms, tail_ms = res
        # envelope estimate from framed noise wobbles; band, not bit
        assert abs(rt60_ms - rt60_s * 1000.0) < 0.25 * rt60_s * 1000.0
        assert slope < -1.0
        assert tail_ms > 1000.0  # peak near t=0, tail spans most of the clip


def test_faster_decay_reads_smaller_rt60():
    _, fast, _ = reverb.clip_reverb(_decaying(0.2), 16000)
    _, slow, _ = reverb.clip_reverb(_decaying(1.5), 16000)
    assert fast < slow


def test_sustained_signal_is_no_decay():
    res = reverb.clip_reverb(_noise(32000), 16000)
    assert res is not None
    slope, rt60_ms, _ = res
    assert rt60_ms == 0.0  # no-decay sentinel
    assert slope > -1.0


def test_silence_short_and_undecodable_are_contained():
    assert reverb.clip_reverb(np.zeros(16000, np.float32), 16000) is None
    assert reverb.clip_reverb(_noise(500), 16000) is None  # < 8 tail frames
    assert reverb.clip_reverb(None, 16000) is None
    assert reverb.clip_reverb(_noise(16000), 0) is None


def test_operator_matches_serial_clip_reverb(spark):
    rows = [
        ("decay", audio.encode_wav(_decaying(0.5), 16000), "wav", 16000),
        ("flat", audio.encode_wav(_noise(32000), 16000), "wav", 16000),
        ("sil", audio.encode_wav(np.zeros(16000, np.float32), 16000), "wav", 16000),
        ("broken", b"xx", "wav", 16000),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    out = {r["clip_id"]: r for r in reverb.reverb_stats(df).collect()}
    for cid, raw, codec, sr_decl in rows:
        samples, sr_meas = audio.decode_clip(raw, codec)
        sr = sr_meas or audio.declared_sr(sr_decl)
        res = reverb.clip_reverb(samples, sr)
        got = out[cid]
        if res is None:
            assert not got["rev_ok"]
        else:
            assert got["rev_ok"]
            assert (got["decay_db_s"], got["rt60_ms"], got["tail_ms"]) == res
