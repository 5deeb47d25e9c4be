"""Silence trimming (operators/trim.py): endpoint localization, padding,
interior-pause preservation, containment, and sample-exactness."""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import trim

SR = 16000


def _burst(lead_s: float, speech_s: float, tail_s: float) -> np.ndarray:
    """lead silence + modulated tone burst + tail silence."""
    rng = np.random.default_rng(11)
    t = np.arange(int(SR * speech_s)) / SR
    env = 0.5 * (1.0 + np.sign(np.sin(2 * np.pi * 4.0 * t)))  # 4 Hz bursts
    speech = (0.4 * env * np.sin(2 * np.pi * 300.0 * t)).astype(np.float32)
    speech += (0.001 * rng.standard_normal(len(speech))).astype(np.float32)
    return np.concatenate(
        [
            np.zeros(int(SR * lead_s), dtype=np.float32),
            speech,
            np.zeros(int(SR * tail_s), dtype=np.float32),
        ]
    )


def _df(spark, rows):
    return spark.createDataFrame(
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


def test_trim_cuts_lead_and_tail_but_keeps_speech(spark):
    sig = _burst(1.0, 2.0, 1.5)
    rows = {
        r["clip_id"]: r
        for r in trim.trim_silence(_df(spark, [("a", sig)])).collect()
    }
    r = rows["a"]
    assert r["trim_ok"]
    assert r["dur_ms_in"] == 4500
    # trimmed to ~speech + 2x100ms pad, never longer than the input
    assert 1900 <= r["dur_ms_out"] <= 2600
    # the trimmed payload is a contiguous slice of the original samples
    orig, _ = audio.decode_clip_i16(audio.encode_wav(sig, SR), "wav")
    cut = np.frombuffer(r["trim_bytes"], dtype="<i2")
    assert len(cut) == int(round(r["dur_ms_out"] * SR / 1000.0))
    # locate the slice: it must appear exactly in the original
    peak_orig = int(np.argmax(np.abs(orig)))
    peak_cut = int(np.argmax(np.abs(cut)))
    start = peak_orig - peak_cut
    assert start >= 0
    assert np.array_equal(orig[start : start + len(cut)], cut)


def test_interior_pause_is_preserved(spark):
    """Two bursts with a 1 s gap: the trim spans burst1..burst2, gap intact."""
    one = _burst(0.5, 0.5, 0.0)
    gap = np.zeros(SR, dtype=np.float32)
    two = _burst(0.0, 0.5, 0.5)
    sig = np.concatenate([one, gap, two])
    r = trim.trim_silence(_df(spark, [("a", sig)])).collect()[0]
    assert r["trim_ok"]
    # both bursts + the full interior gap survive (≥ 0.5+1.0+0.5 s)
    assert r["dur_ms_out"] >= 1900


def test_containment(spark):
    silent = np.zeros(SR, dtype=np.float32)
    rows = {
        r["clip_id"]: r
        for r in trim.trim_silence(
            _df(spark, [("sil", silent), ("null", None)])
        ).collect()
    }
    assert not rows["sil"]["trim_ok"] and rows["sil"]["trim_bytes"] is None
    assert rows["sil"]["dur_ms_in"] == 1000  # decoded fine, just no speech
    assert not rows["null"]["trim_ok"] and rows["null"]["dur_ms_in"] == 0


def test_trim_is_idempotent(spark):
    """Trimming an already-trimmed clip changes (almost) nothing — the pad
    keeps up to pad_ms of context per side, so a second pass may shave at
    most that."""
    sig = _burst(1.0, 2.0, 1.0)
    first = trim.trim_silence(_df(spark, [("a", sig)])).collect()[0]
    again_sig = np.frombuffer(first["trim_bytes"], dtype="<i2").astype(
        np.float32
    ) / 32767.0
    second = trim.trim_silence(_df(spark, [("a", again_sig)])).collect()[0]
    assert second["trim_ok"]
    assert first["dur_ms_out"] - second["dur_ms_out"] <= 220
