"""Speed-perturbation operator (operators/augment.py): duration scaling,
identity factor round trip, key derivation, and containment."""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import augment


def _sine(n: int, sr: int, freq: float = 220.0) -> np.ndarray:
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture(scope="module")
def aug_clips(spark):
    rows = [
        ("one_sec", audio.encode_wav(_sine(16000, 16000), 16000), 16000, 1000, "wav"),
        ("half_sec_8k", audio.encode_wav(_sine(4000, 8000), 8000), 8000, 500, "wav"),
        ("broken", b"not audio", 16000, 1000, "wav"),
    ]
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    )


def test_fanout_keys_and_durations(aug_clips):
    out = augment.speed_perturb(aug_clips, factors=(0.9, 1.0, 1.1)).collect()
    by_key = {r["aug_id"]: r for r in out}
    # 2 decodable clips × 3 factors; broken emits nothing (containment)
    assert len(out) == 6
    assert not any(r["clip_id"] == "broken" for r in out)
    assert by_key["one_sec#sp1"]["dur_ms_out"] == 1000
    # factor f scales duration by 1/f (sox/Kaldi speed semantics)
    assert by_key["one_sec#sp0.9"]["dur_ms_out"] == pytest.approx(1111, abs=1)
    assert by_key["one_sec#sp1.1"]["dur_ms_out"] == pytest.approx(909, abs=1)
    # sample rate is preserved; payload length matches the duration
    for r in out:
        assert r["sr_hz"] in (16000, 8000)
        n = (len(r["aug_bytes"]) - 44) // 2  # RIFF header is 44 bytes
        # dur_ms_out is rounded to 1 ms, so allow one millisecond of samples
        assert n == pytest.approx(
            r["dur_ms_out"] * r["sr_hz"] / 1000, abs=r["sr_hz"] / 1000
        )


def test_identity_factor_is_byte_exact(aug_clips):
    """factor 1.0 must reproduce the original WAV payload byte-for-byte —
    the augmented corpus strictly contains the source corpus."""
    src = {r["clip_id"]: bytes(r["bytes"]) for r in aug_clips.collect()}
    out = augment.speed_perturb(aug_clips, factors=(1.0,)).collect()
    assert len(out) == 2
    for r in out:
        assert bytes(r["aug_bytes"]) == src[r["clip_id"]]


def test_perturbed_payload_decodes_and_matches_resample(aug_clips):
    """The 0.9x payload must equal resample_linear(sr*0.9 → sr) of the
    source, after one int16 quantization — the per-row invariant."""
    out = {
        r["aug_id"]: r
        for r in augment.speed_perturb(aug_clips, factors=(0.9,)).collect()
    }
    x = _sine(16000, 16000)
    want = audio.resample_linear(x, int(round(16000 * 0.9)), 16000)
    got, sr = audio.decode_clip(bytes(out["one_sec#sp0.9"]["aug_bytes"]), "wav")
    assert sr == 16000
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=1.0 / 32768)


def test_bad_factors_rejected(aug_clips):
    with pytest.raises(ValueError):
        augment.speed_perturb(aug_clips, factors=())
    with pytest.raises(ValueError):
        augment.speed_perturb(aug_clips, factors=(0.0, 1.0))


def test_noise_mix_hits_target_snr_and_is_deterministic(aug_clips, spark):
    """Mixed payload must sit near the requested SNR (clipping allows a
    little drift) and be byte-identical across runs and partitionings —
    the retry-safety contract of the content-seeded RNG."""
    from wallaby2caom2_spark.operators.augment import noise_mix

    out1 = {r["aug_id"]: r for r in noise_mix(aug_clips, snr_db=20.0).collect()}
    out2 = {
        r["aug_id"]: r
        for r in noise_mix(aug_clips.repartition(3), snr_db=20.0).collect()
    }
    assert set(out1) == set(out2) and len(out1) == 2  # broken clip contained
    for k in out1:
        assert bytes(out1[k]["aug_bytes"]) == bytes(out2[k]["aug_bytes"])
        assert out1[k]["mix_ok"]
    # verify the achieved SNR on the 1 s 16 kHz tone
    r = out1["one_sec#nz20"]
    mixed, sr = audio.decode_clip(bytes(r["aug_bytes"]), "wav")
    x = _sine(16000, 16000)
    noise = mixed - x
    snr = 10 * np.log10(np.mean(x**2) / np.mean(noise**2))
    assert 18.5 < snr < 21.5


def test_noise_mix_contains_silent_clips(spark):
    from wallaby2caom2_spark.operators.augment import noise_mix

    df = spark.createDataFrame(
        [("quiet", audio.encode_wav(np.zeros(1600, dtype=np.float32), 16000),
          16000, 100, "wav")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
    )
    rows = noise_mix(df).collect()
    assert len(rows) == 1 and not rows[0]["mix_ok"]
    dec, _ = audio.decode_clip(bytes(rows[0]["aug_bytes"]), "wav")
    assert float(np.abs(dec).max()) == 0.0  # untouched, not noise-filled
