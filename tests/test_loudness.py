"""Gated program loudness (operators/loudness.py): spec-anchor levels
(BS.1770 997 Hz sine), K-weighting shape (low-cut / shelf boost), gating
behavior on bursty program material, containment, operator-vs-serial
equality."""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import loudness


def _tone(f: float, secs: float = 3.0, sr: int = 16000, amp: float = 1.0):
    t = np.arange(int(secs * sr)) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_997hz_full_scale_reads_minus_3_lufs():
    # BS.1770 anchor: a 997 Hz 0 dBFS sine measures −3.01 LUFS; the
    # per-block spectral K application lands within 0.1 LU of it
    lufs, peak, n, gated, _ = loudness.clip_loudness(_tone(997.0), 16000)
    assert abs(lufs - (-3.01)) < 0.1
    assert abs(peak) < 1e-6  # 0 dBFS
    assert gated == n  # steady tone: every block survives both gates


def test_k_weighting_cuts_lows_and_boosts_highs():
    base, _, _, _, _ = loudness.clip_loudness(_tone(997.0), 16000)
    low, _, _, _, _ = loudness.clip_loudness(_tone(40.0), 16000)
    high, _, _, _, _ = loudness.clip_loudness(_tone(3000.0), 16000)
    assert low < base - 3.0  # 38 Hz high-pass attenuates 40 Hz
    assert high > base + 2.0  # ~+4 dB shelf above ~1.5 kHz


def test_gate_tracks_bursts_not_silence():
    # mostly near-silence with one loud speech-band burst: the gated
    # measure tracks the burst; the ungated block mean would sit far lower
    sr = 16000
    x = np.zeros(sr * 8, dtype=np.float32)
    x += 0.0005 * np.random.default_rng(3).standard_normal(len(x)).astype(
        np.float32
    )
    burst = _tone(500.0, secs=1.0, amp=0.5)
    x[sr : sr + len(burst)] += burst
    lufs, _, n_blocks, gated, rng_db = loudness.clip_loudness(x, sr)
    burst_only, _, _, _, _ = loudness.clip_loudness(burst, sr)
    assert gated < n_blocks / 2  # quiet blocks fell to the gates
    assert abs(lufs - burst_only) < 3.0  # integrated ≈ the program level
    assert rng_db > 20.0  # levels span silence → burst


def test_sample_rate_independence_of_the_anchor():
    # the same program should measure ~the same LUFS at different rates
    a, _, _, _, _ = loudness.clip_loudness(_tone(997.0, sr=16000), 16000)
    b, _, _, _, _ = loudness.clip_loudness(_tone(997.0, sr=22050), 22050)
    c, _, _, _, _ = loudness.clip_loudness(_tone(997.0, sr=8000), 8000)
    assert abs(a - b) < 0.2
    assert abs(a - c) < 0.5  # 8 kHz: shelf corner nearer Nyquist


def test_silence_short_and_low_rate_are_contained():
    assert loudness.clip_loudness(np.zeros(16000, np.float32), 16000) is None
    assert loudness.clip_loudness(None, 16000) is None
    # shorter than one 400 ms block
    assert loudness.clip_loudness(np.ones(1000, np.float32), 16000) is None
    # rate below the shelf-design floor
    assert loudness.clip_loudness(np.ones(4000, np.float32), 2000) is None


def test_operator_matches_serial_clip_loudness(spark):
    rows = [
        ("anchor", audio.encode_wav(_tone(997.0, sr=8000), 8000), "wav", 8000),
        ("quiet", audio.encode_wav(_tone(500.0, amp=0.001, sr=8000), 8000), "wav", 8000),
        ("sil", audio.encode_wav(np.zeros(8000, np.float32), 8000), "wav", 8000),
        ("broken", b"xx", "wav", 8000),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    out = {r["clip_id"]: r for r in loudness.loudness_stats(df).collect()}
    assert set(out) == {"anchor", "quiet", "sil", "broken"}
    for cid, raw, codec, sr_decl in rows:
        samples, sr_meas = audio.decode_clip(raw, codec)
        sr = sr_meas or audio.declared_sr(sr_decl)
        res = loudness.clip_loudness(samples, sr)
        got = out[cid]
        if res is None:
            assert not got["loud_ok"]
        else:
            assert got["loud_ok"]
            assert (
                got["lufs"],
                got["peak_dbfs"],
                got["n_blocks"],
                got["n_gated_blocks"],
                got["block_range_db"],
            ) == res
