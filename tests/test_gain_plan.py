"""Loudness-normalization gain plan (queries/clips_flagship.py
audio_gain_plan): gain arithmetic, clipping-risk accounting, and the
median's robustness to unmeasurable clips."""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import loudness


def _tone(f: float, secs: float, sr: int, amp: float) -> np.ndarray:
    t = np.arange(int(secs * sr)) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_gain_plan_arithmetic_on_planted_clips(spark, tmp_path, monkeypatch):
    """Quiet clips at a known LUFS must produce gain ≈ target − median and
    count exactly the clips whose peak would clip after that gain."""
    from wallaby2caom2_spark.queries import clips_flagship as cf

    sr = 8000
    rows = []
    # ten quiet tones (~ -31 LUFS), peaks near -28 dBFS → no clip risk
    for i in range(10):
        rows.append(
            (f"q{i:02d}", audio.encode_wav(_tone(500, 2.0, sr, 0.04), sr),
             sr, 2000, "wav", "quiet tone")
        )
    # two loud tones whose peak is already near full scale → clip risk
    for i in range(2):
        rows.append(
            (f"l{i}", audio.encode_wav(_tone(500, 2.0, sr, 0.9), sr),
             sr, 2000, "wav", "loud tone")
        )
    # one silent (unmeasurable) clip — must not move the median
    rows.append(
        ("sil", audio.encode_wav(np.zeros(sr, np.float32), sr),
         sr, 1000, "wav", "silence")
    )
    df = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    clips_dir = str(tmp_path / "clips")
    df.write.parquet(clips_dir)
    monkeypatch.setattr(cf, "clips_path_for", lambda sf_dir: clips_dir)

    out = cf.audio_gain_plan(spark, "ignored").collect()
    assert len(out) == 1 and out[0]["codec"] == "wav"
    row = out[0]
    assert row["n_measurable"] == 12  # silence excluded

    # reference arithmetic straight from the shared per-clip function
    lufs, peaks = [], []
    for cid, raw, *_ in rows:
        samples, sr_m = audio.decode_clip(raw, "wav")
        res = loudness.clip_loudness(samples, sr_m or sr)
        if res is not None:
            lufs.append(res[0])
            peaks.append(res[1])
    med = float(np.median(lufs))
    gain = cf._GAIN_TARGET_LUFS - round(med + 1e-9, 4)
    assert row["median_lufs"] == pytest.approx(med, abs=1e-3)
    assert row["gain_db"] == pytest.approx(gain, abs=1e-3)
    expect_risk = sum(
        1 for p in peaks if p + row["gain_db"] > cf._GAIN_CLIP_CEIL
    )
    assert row["n_clip_risk"] == expect_risk
    assert expect_risk == 2  # exactly the two near-full-scale clips
