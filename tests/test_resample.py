"""Canonical-rate conversion (operators/resample.py).

Pins the three-path contract (passthrough byte-exactness, upsample
geometry, anti-aliased downsample), the containment classes, determinism,
and Spark-vs-shared-function identity — the expected/actual style of the
reference's storage-name unit tables
(wallaby2caom2/tests/test_storage_name.py:74-109).
"""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators.resample import (
    TARGET_SR,
    resample_clip,
    resample_clips,
)


def _rms(x: np.ndarray) -> float:
    return float(np.sqrt(np.mean(np.square(x, dtype=np.float64))))


def _tone(freq: int, sr: int, secs: float = 1.0, amp: float = 0.5):
    t = np.arange(int(sr * secs)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# ---------------------------------------------------------------------------
# the band-limited helper itself
# ---------------------------------------------------------------------------

def test_downsample_kills_above_nyquist_energy():
    """A 10 kHz tone is ABOVE the 8 kHz output Nyquist: naive linear
    interpolation folds it in-band at full energy; the FIR path must
    attenuate it by >20 dB. This asymmetry is the whole reason the
    operator has a dedicated downsample path."""
    x = _tone(10_000, 48_000)
    bl = audio.resample_bandlimited(x, 48_000, 16_000)
    lin = audio.resample_linear(x, 48_000, 16_000)
    assert _rms(lin) > 0.3 * _rms(x)  # aliased energy survives linear
    assert _rms(bl) < 0.1 * _rms(lin)  # FIR path rejects it


def test_downsample_preserves_in_band_energy():
    x = _tone(1_000, 48_000)
    y = audio.resample_bandlimited(x, 48_000, 16_000)
    assert len(y) == 16_000
    assert abs(_rms(y) - _rms(x)) < 0.01 * _rms(x)


def test_upsample_path_is_linear():
    x = _tone(1_000, 8_000)
    assert np.array_equal(
        audio.resample_bandlimited(x, 8_000, 16_000),
        audio.resample_linear(x, 8_000, 16_000),
    )


def test_lowpass_kernel_unit_dc_gain():
    from wallaby2caom2_spark.functions.audio import _lowpass_kernel

    h = _lowpass_kernel(0.15)
    assert abs(h.sum() - 1.0) < 1e-12
    # symmetric (linear phase)
    assert np.allclose(h, h[::-1])


# ---------------------------------------------------------------------------
# the per-clip shared function
# ---------------------------------------------------------------------------

def test_passthrough_is_byte_exact():
    x = _tone(440, TARGET_SR)
    raw = audio.encode_pcm_s16le(x)
    r = resample_clip(raw, "pcm_s16le", TARGET_SR)
    assert r["rs_ok"] and r["rs_method"] == "passthrough"
    assert r["rs_bytes"] == raw  # no float round trip, lossless
    assert r["sr_in_hz"] == r["sr_out_hz"] == TARGET_SR


@pytest.mark.parametrize(
    "sr_in,method",
    [(8_000, "upsample_linear"), (44_100, "downsample_fir"),
     (48_000, "downsample_fir")],
)
def test_conversion_geometry(sr_in, method):
    x = _tone(500, sr_in, secs=0.5)
    r = resample_clip(audio.encode_wav(x, sr_in), "wav", sr_in)
    assert r["rs_ok"] and r["rs_method"] == method
    assert r["sr_in_hz"] == sr_in and r["sr_out_hz"] == TARGET_SR
    n_out = len(r["rs_bytes"]) // 2
    assert n_out == int(round(len(x) * TARGET_SR / sr_in))
    assert abs(r["dur_ms_out"] - r["dur_ms_in"]) <= 1  # duration preserved


def test_containment_classes():
    assert resample_clip(b"", "wav", 48_000)["rs_method"] == "undecodable"
    assert resample_clip(None, "wav", 48_000)["rs_method"] == "undecodable"
    # headerless pcm with NULL declared rate has no rate at all
    raw = audio.encode_pcm_s16le(_tone(440, 16_000))
    r = resample_clip(raw, "pcm_s16le", None)
    assert not r["rs_ok"] and r["rs_method"] == "rateless"


def test_determinism():
    x = _tone(777, 44_100)
    raw = audio.encode_wav(x, 44_100)
    a = resample_clip(raw, "wav", 44_100)
    b = resample_clip(raw, "wav", 44_100)
    assert a == b


# ---------------------------------------------------------------------------
# the Spark operator
# ---------------------------------------------------------------------------

def test_operator_matches_shared_function(spark, tmp_path):
    from wallaby2caom2_spark import datagen

    path = str(tmp_path / "clips")
    datagen.write_clips_parquet(path, 120, seed=7, rows_per_file=60)
    df = spark.read.parquet(path)
    got = {r["clip_id"]: r for r in resample_clips(df).collect()}
    for row in df.collect():
        exp = resample_clip(
            bytes(row["bytes"]) if row["bytes"] is not None else None,
            row["codec"],
            row["sr_hz"],
        )
        g = got[row["clip_id"]]
        assert g["rs_ok"] == exp["rs_ok"], row["clip_id"]
        assert g["rs_method"] == exp["rs_method"], row["clip_id"]
        assert (
            (g["rs_bytes"] is None and exp["rs_bytes"] is None)
            or bytes(g["rs_bytes"]) == exp["rs_bytes"]
        ), row["clip_id"]
        assert g["rs_rms"] == exp["rs_rms"], row["clip_id"]


def test_operator_plan_is_single_stage_no_shuffle(spark, tmp_path):
    from wallaby2caom2_spark import datagen

    path = str(tmp_path / "clips")
    datagen.write_clips_parquet(path, 40, seed=3, rows_per_file=40)
    plan = resample_clips(
        spark.read.parquet(path)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1
