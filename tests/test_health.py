"""Waveform-health gate (operators/health.py) and canonical-transcode
migration (operators/transcode.py): crest/DC behavior on planted material,
sample-exact round trips per codec, checksum container-invariance,
containment, operator-vs-serial equality."""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import health, transcode


def _speechish(n: int = 16000, sr: int = 8000) -> np.ndarray:
    t = np.arange(n) / sr
    env = np.where(np.mod(4.0 * t, 1.0) < 0.5, 1.0, 0.08)
    rng = np.random.default_rng(3)
    return (
        0.4 * np.sin(2 * np.pi * 300.0 * t) * env
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)


def test_clipped_material_lands_over_compressed():
    x = _speechish()
    clipped = np.clip(x * 8.0, -1.0, 1.0).astype(np.float32)
    dc_x, crest_x, _ = health.clip_health(x)
    dc_c, crest_c, peak_c = health.clip_health(clipped)
    assert crest_c < crest_x  # limiting crushes the crest factor
    assert crest_c < 6.0  # the gate's over_compressed band
    assert peak_c == 1.0


def test_dc_bias_is_visible():
    x = _speechish()
    biased = (x + 0.05).astype(np.float32)
    dc, _, _ = health.clip_health(biased)
    assert abs(dc - 0.05) < 0.005


def test_health_containment():
    assert health.clip_health(None) is None
    assert health.clip_health(np.zeros(0, np.float32)) is None
    assert health.clip_health(np.zeros(8000, np.float32)) is None  # silence


def test_transcode_roundtrips_exact_per_codec():
    x = _speechish()
    for codec, payload in (
        ("wav", audio.encode_wav(x, 8000)),
        ("flac", audio.encode_flac_stub(x, 8000)),
        ("pcm_s16le", audio.encode_pcm_s16le(x)),
    ):
        res = transcode.clip_transcode(payload, codec, 8000)
        assert res is not None, codec
        exact, canon_len, ratio, crc = res
        assert exact, codec  # lossless canonicalization, proven per clip
        assert canon_len == 44 + 2 * len(x)
        assert ratio > 0

    # container-invariance: same samples through different containers
    # collide on the canonical checksum
    crc_wav = transcode.clip_transcode(audio.encode_wav(x, 8000), "wav", 8000)[3]
    crc_flac = transcode.clip_transcode(
        audio.encode_flac_stub(x, 8000), "flac", 8000
    )[3]
    crc_pcm = transcode.clip_transcode(
        audio.encode_pcm_s16le(x), "pcm_s16le", 8000
    )[3]
    assert crc_wav == crc_flac == crc_pcm

    # full-scale negative peak (int16 -32768) still round-trips exactly
    neg = np.full(4000, -32768, dtype="<i2").tobytes()
    res = transcode.clip_transcode(neg, "pcm_s16le", 8000)
    assert res is not None and res[0]


def test_transcode_containment():
    assert transcode.clip_transcode(None, "wav", 8000) is None
    assert transcode.clip_transcode(b"", "wav", 8000) is None
    assert transcode.clip_transcode(b"junk", "wav", 8000) is None
    # rateless raw PCM with no usable declared rate → nothing to write
    raw = audio.encode_pcm_s16le(_speechish())
    assert transcode.clip_transcode(raw, "pcm_s16le", None) is None
    assert transcode.clip_transcode(raw, "pcm_s16le", 0) is None


def test_operators_match_serial_functions(spark):
    x = _speechish()
    rows = [
        ("a", audio.encode_wav(x, 8000), "wav", 8000),
        ("b", audio.encode_flac_stub(x, 8000), "flac", 8000),
        ("sil", audio.encode_wav(np.zeros(8000, np.float32), 8000), "wav", 8000),
        ("broken", b"xx", "wav", 8000),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    decoded, _ = audio.decode_clip(audio.encode_wav(x, 8000), "wav")
    href = health.clip_health(decoded)
    got = {r["clip_id"]: r for r in health.health_stats(df).collect()}
    assert got["a"]["wh_ok"]
    assert (got["a"]["dc_offset"], got["a"]["crest_db"], got["a"]["peak"]) == href
    assert not got["sil"]["wh_ok"] and not got["broken"]["wh_ok"]

    tref = transcode.clip_transcode(audio.encode_wav(x, 8000), "wav", 8000)
    tgot = {r["clip_id"]: r for r in transcode.transcode_stats(df).collect()}
    assert tgot["a"]["tc_ok"] and tgot["a"]["codec"] == "wav"
    assert (
        tgot["a"]["tc_exact"],
        tgot["a"]["canon_len"],
        tgot["a"]["size_ratio"],
        tgot["a"]["canon_crc32"],
    ) == tref
    assert tgot["b"]["canon_crc32"] == tgot["a"]["canon_crc32"]
    assert not tgot["broken"]["tc_ok"]


def test_crest_is_gain_invariant_and_dc_scales():
    """Power-of-two gain is exact in float: crest (a ratio) must be
    bit-identical, DC must scale with the gain."""
    x = _speechish()
    dc, crest, peak = health.clip_health(x)
    dc2, crest2, peak2 = health.clip_health((x * 2.0).astype(np.float32))
    assert crest2 == crest
    assert dc2 == 2.0 * dc
    assert peak2 == 2.0 * peak


def test_transcode_exact_on_arbitrary_int16():
    """Any int16 sample vector round-trips sample-exact through the
    canonical container (hypothesis-style sweep over deterministic RNG
    draws incl. full-scale extremes)."""
    rng = np.random.default_rng(11)
    for trial in range(10):
        n = int(rng.integers(100, 5000))
        x = rng.integers(-32768, 32768, size=n).astype("<i2")
        res = transcode.clip_transcode(x.tobytes(), "pcm_s16le", 16000)
        assert res is not None and res[0], trial
