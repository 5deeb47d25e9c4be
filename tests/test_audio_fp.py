"""Audio-content fingerprint + banded near-dup join (operators/audio_fp.py).

Mirrors the reference's literal expected-map unit style
(``wallaby2caom2/tests/test_storage_name.py:74-109``): hand-built signals
with known relationships, exact assertions on the derived identity.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import audio_fp


def _tone(freq: float, seed: int, n: int = 16000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (
        0.4 * np.sin(2 * np.pi * freq * t)
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)


def test_fingerprint_deterministic_and_gain_invariant():
    a = _tone(440.0, seed=1)
    ok1, f1 = audio.band_fingerprint(a)
    ok2, f2 = audio.band_fingerprint(a.copy())
    assert ok1 and ok2 and f1 == f2
    # gain through int16 encode/decode round-trip: same identity
    dec, _ = audio.decode_clip(audio.encode_pcm_s16le(a * 0.5), "pcm_s16le")
    ok3, f3 = audio.band_fingerprint(dec)
    assert ok3 and f3 == f1


def test_fingerprint_separates_distinct_content():
    _, f1 = audio.band_fingerprint(_tone(440.0, seed=1))
    _, f2 = audio.band_fingerprint(_tone(1200.0, seed=2))
    assert bin(f1 ^ f2).count("1") >= 10  # unrelated ≈ 30/60 bits differ


def test_fingerprint_sample_rate_invariant():
    """The same recording delivered at different sample rates carries the
    same identity: both decimate to the fixed analysis rate first."""
    dur = 1.0
    # structured multi-tone content (what carries identity in real audio);
    # broadband noise at the analysis Nyquist is where the linear-interp
    # decimator — a stand-in for a polyphase filter — legitimately differs
    tones = ((523.0, 0.3), (880.0, 0.2), (247.0, 0.25), (1319.0, 0.1))
    fps = {}
    for sr in (16000, 44100):
        t = np.arange(int(dur * sr)) / sr
        sig = np.zeros_like(t)
        for freq, amp in tones:
            sig = sig + amp * np.sin(2 * np.pi * freq * t)
        ok, fps[sr] = audio.band_fingerprint(sig.astype(np.float32), sr)
        assert ok
    assert bin(fps[16000] ^ fps[44100]).count("1") <= 6


def test_fingerprint_containment_short_and_none():
    assert audio.band_fingerprint(None) == (False, 0)
    assert audio.band_fingerprint(np.zeros(8, dtype=np.float32)) == (False, 0)


@pytest.fixture(scope="module")
def fp_clips(spark):
    rows = []
    for i, freq in enumerate((300.0, 520.0, 870.0, 1400.0, 2200.0)):
        payload = audio.encode_wav(_tone(freq, seed=10 + i), 16000)
        rows.append((f"clip-{i}", payload, 16000, 1000, "wav"))
    # redelivered copy of clip-2 under a new id, re-levelled at 0.6x
    dup = audio.encode_wav(_tone(870.0, seed=12) * 0.6, 16000)
    rows.append(("clip-redeliver", dup, 16000, 1000, "wav"))
    # undecodable payload flows through with fp_ok=false
    rows.append(("clip-bad", b"\x00\x01garbage", 16000, 1000, "wav"))
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    )


def test_with_fingerprint_spark(fp_clips):
    out = {
        r["clip_id"]: (r["fp_ok"], r["fp"])
        for r in audio_fp.with_fingerprint(fp_clips).collect()
    }
    assert not out["clip-bad"][0]
    assert all(out[f"clip-{i}"][0] for i in range(5))
    # Spark fingerprint == local fingerprint (same code path, Arrow batch)
    local = audio.band_fingerprint(
        audio.decode_clip(
            audio.encode_wav(_tone(300.0, seed=10), 16000), "wav"
        )[0],
        16000,
    )[1]
    assert out["clip-0"][1] == local


def test_with_fingerprint_gates_rateless_clips(spark):
    """A decodable raw-PCM clip with a NULL declared rate has no analysis
    rate, so its fingerprint would be rate-variant; the standalone operator
    must gate it out (fp_ok=false) exactly like the fused audio_signals
    pass (sig_ok=false) — the two are documented interchangeable."""
    pcm = audio.encode_pcm_s16le(_tone(300.0, seed=10))
    df = spark.createDataFrame(
        [("rateless", pcm, None, 1000, "pcm_s16le")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
    )
    row = audio_fp.with_fingerprint(df).collect()[0]
    assert row["fp_ok"] is False

    from wallaby2caom2_spark.operators.audio_signals import audio_signals

    sig = audio_signals(df.select("clip_id", "bytes", "codec", "sr_hz"))
    assert sig.collect()[0]["sig_ok"] is False


def test_banded_neardup_excludes_zero_band_bucket(spark):
    """Clips whose ONLY common band value is the degenerate all-zero band
    (gated silent segments) must not become candidate pairs — that bucket
    is a quadratic hot key at corpus scale."""
    from pyspark.sql import functions as F

    # fingerprints that agree ONLY on band 0 == 0 (low 15 bits zero),
    # differing everywhere else
    rows = [
        ("za", True, 0b101010101010101_000000000000000_111111111111111_000000000000000),
        ("zb", True, 0b010101010101010_111111111111111_000000000000000_000000000000000),
    ]
    df = spark.createDataFrame(rows, "clip_id string, fp_ok boolean, fp long")
    pairs = audio_fp.banded_neardup_pairs(df, max_hamming=60).collect()
    assert pairs == []


def test_banded_neardup_finds_redelivered_pair(fp_clips):
    pairs = audio_fp.banded_neardup_pairs(
        audio_fp.with_fingerprint(fp_clips), max_hamming=3
    ).collect()
    found = {(r["clip_a"], r["clip_b"]): r["hamming"] for r in pairs}
    assert ("clip-2", "clip-redeliver") in found
    assert found[("clip-2", "clip-redeliver")] == 0
    # no unrelated tone pair sneaks under the hamming gate
    assert all("redeliver" in a or "redeliver" in b for (a, b) in found)


def test_banded_join_has_no_cartesian(spark, fp_clips):
    plan = audio_fp.banded_neardup_pairs(
        audio_fp.with_fingerprint(fp_clips)
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
