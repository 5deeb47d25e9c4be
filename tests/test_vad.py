"""VAD operator: known tone/silence layouts → expected speech ratio, run
count and SNR; undecodable clips contained as vad_ok=false rows."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators.vad import _clip_vad, vad_stats

SR = 16000

CLIP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("codec", T.StringType()),
        T.StructField("sr_hz", T.IntegerType()),
    ]
)


def _tone(dur_s: float, amp: float, freq: float = 440.0) -> np.ndarray:
    t = np.arange(int(SR * dur_s)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _silence(dur_s: float) -> np.ndarray:
    return np.zeros(int(SR * dur_s), dtype=np.float32)


def _i16(x: np.ndarray) -> np.ndarray:
    return np.frombuffer(audio.encode_pcm_s16le(x), dtype="<i2")


def test_half_speech_two_bursts():
    x = np.concatenate(
        [_silence(0.25), _tone(0.25, 0.3), _silence(0.25), _tone(0.25, 0.3)]
    )
    n_frames, n_speech, n_runs, snr_db = _clip_vad(_i16(x), SR, 20, 10, 10.0)
    assert n_frames > 0
    # two bursts, each ~25% of frames (boundary frames straddle → slack)
    assert 0.40 <= n_speech / n_frames <= 0.60
    assert n_runs == 2
    assert snr_db > 30.0  # tone vs digital silence


def test_pure_silence_and_steady_tone_score_zero():
    for x in (_silence(1.0), _tone(1.0, 0.3)):
        n_frames, n_speech, n_runs, snr_db = _clip_vad(_i16(x), SR, 20, 10, 10.0)
        assert n_frames > 0
        assert n_speech == 0 and n_runs == 0 and snr_db == 0.0


def test_speech_over_noise_floor():
    rng = np.random.default_rng(11)
    noise = (0.01 * rng.standard_normal(SR)).astype(np.float32)
    x = noise.copy()
    x[4000:8000] += _tone(0.25, 0.4)
    n_frames, n_speech, n_runs, snr_db = _clip_vad(_i16(x), SR, 20, 10, 10.0)
    assert 0.15 <= n_speech / n_frames <= 0.35
    assert n_runs == 1
    assert 20.0 <= snr_db <= 60.0


def test_operator_contains_bad_rows(spark):
    burst = np.concatenate([_silence(0.3), _tone(0.3, 0.5), _silence(0.3)])
    rows = [
        ("good", audio.encode_wav(burst, SR), "wav", SR),
        ("trunc", b"RIFF\x00\x00", "wav", SR),
        ("nullb", None, "pcm_s16le", SR),
    ]
    df = spark.createDataFrame(rows, CLIP_SCHEMA)
    got = {r["clip_id"]: r for r in vad_stats(df).collect()}
    assert len(got) == 3
    assert got["good"]["vad_ok"] and got["good"]["n_speech_runs"] == 1
    assert 0.2 < got["good"]["speech_ratio"] < 0.5
    for bad in ("trunc", "nullb"):
        assert not got[bad]["vad_ok"]
        assert got[bad]["n_frames"] == 0 and got[bad]["speech_ratio"] == 0.0


def test_operator_deterministic(spark):
    from wallaby2caom2_spark import datagen

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "clips")
        datagen.write_clips_parquet(p, 200, seed=5)
        df = spark.read.parquet(p)
        a = sorted(map(tuple, vad_stats(df).collect()))
        b = sorted(map(tuple, vad_stats(df.repartition(7)).collect()))
        assert a == b
        assert sum(1 for r in a if r[1]) > 100  # most synth clips decode


def test_passthrough_columns(spark):
    """passthrough carries precomputed columns through the UDF verbatim —
    the zero-shuffle contract the speaking-rate gate relies on."""
    burst = np.concatenate([_silence(0.3), _tone(0.3, 0.5), _silence(0.3)])
    schema = T.StructType(
        list(CLIP_SCHEMA.fields) + [T.StructField("n_chars", T.IntegerType())]
    )
    rows = [
        ("good", audio.encode_wav(burst, SR), "wav", SR, 42),
        ("trunc", b"RIFF\x00\x00", "wav", SR, 7),
    ]
    df = spark.createDataFrame(rows, schema)
    got = {r["clip_id"]: r for r in vad_stats(df, passthrough=("n_chars",)).collect()}
    assert got["good"]["n_chars"] == 42
    assert got["trunc"]["n_chars"] == 7  # carried even for contained rows
    assert not got["trunc"]["vad_ok"]
