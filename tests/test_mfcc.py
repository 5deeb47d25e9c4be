"""MFCC extraction (operators/mfcc.py): DCT/mel basis invariants, frame
math, tone behavior, containment, operator-vs-serial equality."""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.operators import mfcc


def _sine(n: int, sr: int, freq: float, amp: float = 0.5) -> np.ndarray:
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_dct_basis_is_orthonormal():
    d = mfcc.dct_matrix(mfcc.N_MELS, mfcc.N_MELS)  # full square basis
    assert np.allclose(d.T @ d, np.eye(mfcc.N_MELS), atol=1e-12)
    # the operator's truncated basis is the first N_MFCC columns of it
    assert np.allclose(mfcc.dct_matrix(), d[:, : mfcc.N_MFCC])


def test_mel_filterbank_shape_and_coverage():
    n_bins = 201
    m = mfcc.mel_matrix(n_bins)
    assert m.shape == (n_bins, mfcc.N_MELS)
    assert (m >= 0.0).all()
    # every filter has mass, and mel spacing makes low filters narrower
    # (fewer bins) than high ones
    widths = (m > 0).sum(axis=0)
    assert (widths > 0).all()
    assert widths[0] < widths[-1]
    # filter peaks are strictly ascending in frequency
    peaks = m.argmax(axis=0)
    assert (np.diff(peaks) > 0).all()


@pytest.fixture(scope="module")
def mfcc_rows(spark):
    rows = [
        ("low", audio.encode_wav(_sine(16000, 16000, 500.0), 16000), "wav", 16000),
        ("quiet", audio.encode_wav(_sine(16000, 16000, 500.0, 0.05), 16000), "wav", 16000),
        # shorter than one 25 ms frame → zero frames, containment
        ("tiny", audio.encode_wav(_sine(200, 16000, 500.0), 16000), "wav", 16000),
        ("broken", b"xx", "wav", 16000),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    out = {r["clip_id"]: r for r in mfcc.mfcc_frames(df).collect()}
    return rows, out


def test_frame_count_and_tensor_shape(mfcc_rows):
    _, out = mfcc_rows
    r = out["low"]
    assert r["mfcc_ok"] and r["n_frames"] == 98 and r["n_mfcc"] == mfcc.N_MFCC
    coef = np.frombuffer(bytes(r["mfcc_bytes"]), dtype=np.float32).reshape(
        98, mfcc.N_MFCC
    )
    assert np.isfinite(coef).all()


def test_c0_tracks_loudness(mfcc_rows):
    """c0 is the (scaled) total log-mel energy: the louder clip of the same
    tone must have the larger mean c0."""
    _, out = mfcc_rows
    assert out["low"]["c0_mean"] > out["quiet"]["c0_mean"]


def test_containment_rows(mfcc_rows):
    _, out = mfcc_rows
    for cid in ("tiny", "broken"):
        r = out[cid]
        assert not r["mfcc_ok"]
        assert r["n_frames"] == 0 and r["mfcc_bytes"] is None
        assert r["c0_mean"] == 0.0


def test_operator_matches_serial_clip_mfcc(mfcc_rows):
    """The Spark stage is exactly the shared per-clip function — the same
    equality the oracle-replay fixture relies on (tests/test_fixtures.py
    pins it again on the generated corpus)."""
    rows, out = mfcc_rows
    for cid, raw, codec, sr_decl in rows:
        samples, sr_meas = audio.decode_clip(raw, codec)
        sr = sr_meas or audio.declared_sr(sr_decl)
        coef = mfcc.clip_mfcc(samples, sr)
        r = out[cid]
        if coef is None:
            assert not r["mfcc_ok"]
            continue
        got = np.frombuffer(bytes(r["mfcc_bytes"]), dtype=np.float32).reshape(
            r["n_frames"], r["n_mfcc"]
        )
        assert np.array_equal(got, coef)
        assert r["c0_mean"] == float(coef.mean(axis=0, dtype=np.float64)[0])
