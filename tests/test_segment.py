"""Audio segmentation operator (operators/segment.py): windowing math,
resample normalization, containment, and sample-exact reconstruction."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import segment


def _sine(n: int, sr: int, freq: float = 220.0) -> np.ndarray:
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture(scope="module")
def seg_clips(spark):
    rows = [
        # exactly 1.0 s at 16 kHz → 4 full 250 ms windows
        ("full", audio.encode_wav(_sine(16000, 16000), 16000), 16000, 1000, "wav"),
        # 0.9 s → 3 full + 1 partial (100 ms)
        ("partial", audio.encode_wav(_sine(14400, 16000), 16000), 16000, 900, "wav"),
        # 8 kHz source → resampled up to 16 kHz, 0.5 s → 2 windows
        ("upsampled", audio.encode_wav(_sine(4000, 8000), 8000), 8000, 500, "wav"),
        ("broken", b"not audio", 16000, 1000, "wav"),
    ]
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    )


def test_window_counts_and_durations(seg_clips):
    segs = segment.segment_clips(seg_clips, window_ms=250).collect()
    by_clip: dict[str, list] = {}
    for r in segs:
        by_clip.setdefault(r["clip_id"], []).append(r)
    assert "broken" not in by_clip  # containment: zero segments, no failure
    assert len(by_clip["full"]) == 4
    assert [r["seg_dur_ms"] for r in sorted(by_clip["partial"], key=lambda r: r["seg_idx"])] == [250, 250, 250, 150]
    assert len(by_clip["upsampled"]) == 2
    for r in segs:
        assert r["seg_start_ms"] == r["seg_idx"] * 250
        assert len(r["seg_bytes"]) == 2 * round(r["seg_dur_ms"] * 16000 / 1000)


def test_drop_partial_tail(seg_clips):
    segs = segment.segment_clips(
        seg_clips, window_ms=250, keep_partial=False
    ).collect()
    partial = [r for r in segs if r["clip_id"] == "partial"]
    assert len(partial) == 3
    assert all(r["seg_dur_ms"] == 250 for r in partial)


def test_reconstruction_is_sample_exact(seg_clips):
    """Concatenating segment payloads reproduces the original decode —
    the per-row invariant the north rule demands of byte transforms."""
    orig = _sine(16000, 16000)
    segs = sorted(
        segment.segment_clips(seg_clips, window_ms=250)
        .filter(F.col("clip_id") == "full")
        .collect(),
        key=lambda r: r["seg_idx"],
    )
    recon = np.concatenate(
        [
            np.frombuffer(bytes(r["seg_bytes"]), dtype="<i2").astype(np.float32)
            / 32767.0
            for r in segs
        ]
    )
    assert len(recon) == len(orig)
    # one int16 quantization round-trip of tolerance
    assert np.max(np.abs(recon - orig)) <= 2.0 / 32767.0


def test_segment_rms_matches_numpy(seg_clips):
    r = (
        segment.segment_clips(seg_clips, window_ms=250)
        .filter((F.col("clip_id") == "full") & (F.col("seg_idx") == 0))
        .collect()[0]
    )
    seg = np.frombuffer(bytes(r["seg_bytes"]), dtype="<i2").astype(np.float32) / 32767.0
    assert abs(r["seg_rms"] - float(np.sqrt(np.mean(seg**2)))) < 1e-6
