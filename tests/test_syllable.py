"""Syllable-rate gate (operators/syllable.py) and transcript-compressibility
gate (operators/textcomp.py): planted-rate recovery, containment, band
behavior on planted text defects, operator-vs-serial equality."""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import syllable, textcomp


def _modulated(f_mod: float, dur_s: float = 2.0, sr: int = 8000) -> np.ndarray:
    """Speech-shaped test signal: 300 Hz carrier gated at ``f_mod`` Hz."""
    t = np.arange(int(sr * dur_s)) / sr
    env = np.where(np.mod(f_mod * t, 1.0) < 0.5, 1.0, 0.05)
    return (0.4 * np.sin(2 * np.pi * 300.0 * t) * env).astype(np.float32)


def test_planted_modulation_rate_recovered():
    sr = 8000
    for f_mod in (3.0, 4.5, 6.0):
        rate, share, dur = syllable.clip_syllable(_modulated(f_mod, 2.0, sr), sr)
        # envelope FFT bin width at 2 s / pow2 padding is ~0.39 Hz
        assert abs(rate - f_mod) < 0.5, (f_mod, rate)
        assert share > 0.5
        assert dur == 2000


def test_steady_tone_has_low_syllabic_share():
    sr = 8000
    t = np.arange(sr * 2) / sr
    x = (0.4 * np.sin(2 * np.pi * 300.0 * t)).astype(np.float32)
    res = syllable.clip_syllable(x, sr)
    # constant envelope → either contained (no modulation power) or a
    # clearly weak syllabic share — never a confident speech-rhythm read
    assert res is None or res[1] < 0.5


def test_syllable_containment():
    assert syllable.clip_syllable(None, 8000) is None
    assert syllable.clip_syllable(np.zeros(16000, np.float32), 8000) is None
    short = _modulated(4.0, 0.3)  # 30 envelope frames < the 64 minimum
    assert syllable.clip_syllable(short, 8000) is None
    assert syllable.clip_syllable(_modulated(4.0), 0) is None


def test_compression_bands_on_planted_defects():
    rep = ("lorem ipsum dolor " * 16).strip()
    _, _, r_rep = textcomp.transcript_compression(rep)
    assert r_rep < 0.45  # looped template → repetitive band

    rng = np.random.default_rng(7)
    gibberish = "".join(
        chr(c) for c in rng.integers(33, 127, size=400)
    )
    _, _, r_gib = textcomp.transcript_compression(gibberish)
    assert r_gib > r_rep + 0.3  # random chars compress far worse

    tiny = "Ok."
    raw, z, r_tiny = textcomp.transcript_compression(tiny)
    assert raw == 3 and r_tiny >= 1.0  # header-bound band

    assert textcomp.transcript_compression(None) is None
    assert textcomp.transcript_compression("") is None


def test_operators_match_serial_functions(spark):
    x = _modulated(4.0)
    rows = [
        ("mod4", audio.encode_wav(x, 8000), "wav", 8000, "lorem ipsum " * 12),
        ("sil", audio.encode_wav(np.zeros(16000, np.float32), 8000), "wav",
         8000, "short one."),
        ("broken", b"xx", "wav", 8000, None),
    ]
    df = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, codec string, sr_hz int,"
        " transcript string",
    )
    got = {r["clip_id"]: r for r in syllable.syllable_stats(df).collect()}
    # serial reference must see the SAME samples the UDF sees: the wav
    # container quantizes to int16, so decode the encoded bytes first
    decoded, _ = audio.decode_clip(audio.encode_wav(x, 8000), "wav")
    sres = syllable.clip_syllable(decoded, 8000)
    assert got["mod4"]["syl_ok"]
    assert got["mod4"]["syl_rate_hz"] == sres[0]
    assert got["mod4"]["mod_share"] == sres[1]
    assert got["mod4"]["dur_ms"] == sres[2]
    assert got["mod4"]["n_chars"] == len("lorem ipsum " * 12)
    assert not got["sil"]["syl_ok"] and not got["broken"]["syl_ok"]
    assert got["broken"]["n_chars"] == 0

    zgot = {r["clip_id"]: r for r in textcomp.compression_stats(df).collect()}
    zres = textcomp.transcript_compression("lorem ipsum " * 12)
    assert zgot["mod4"]["z_ok"]
    assert (
        zgot["mod4"]["raw_len"],
        zgot["mod4"]["z_len"],
        zgot["mod4"]["z_ratio"],
    ) == zres
    assert not zgot["broken"]["z_ok"]


def test_syllable_rate_is_gain_invariant():
    """Amplitude scaling by powers of two is exact in float — the rate and
    band share must come out bit-identical (the estimator reads rhythm,
    not level)."""
    x = _modulated(4.5)
    base = syllable.clip_syllable(x, 8000)
    for g in (0.5, 2.0):
        scaled = (x * g).astype(np.float32)
        res = syllable.clip_syllable(scaled, 8000)
        assert res[0] == base[0]
        assert res[1] == base[1]


def test_compression_ratio_improves_with_repetition():
    """Deflate must compress s+s strictly better than s once past header
    overhead — the monotonicity the repetitive band relies on."""
    s = "the quick brown fox jumps over the lazy dog. " * 4
    _, _, r1 = textcomp.transcript_compression(s)
    _, _, r2 = textcomp.transcript_compression(s + s)
    assert r2 < r1
