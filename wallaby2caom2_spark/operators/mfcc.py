"""MFCC extraction — the canonical ASR acoustic feature, first-party.

`operators/features.py` produces equal-width log filterbank energies (the
tensor the training shards carry); this operator produces the classic
mel-frequency cepstral coefficients on top of a true MEL filterbank: frame
→ Hann → power spectrum → triangular mel filters → log10 → orthonormal
DCT-II → first ``N_MFCC`` coefficients per frame. Everything is explicit
numpy (the mel matrix and the DCT basis are built from their defining
formulas, no audio library), so the per-clip math is exactly replayable by
the pure-Python fixture (fixtures.py) and the DuckDB oracle replays the
downstream aggregation under the full value-hash check.

Spark shape: one ``mapInPandas`` projection on the scan — payload decodes,
frames, FFTs and dies inside the worker (the pipeline's standard audio-op
contract, operators/features.py:8-14); what leaves is the bounded
coefficient buffer (n_frames x N_MFCC x 4 bytes) plus three summary
doubles. No shuffle. Undecodable / too-short clips emit ``mfcc_ok=false``
containment rows.

Reference analog: the derived-artifact visitor family
(``wallaby2caom2/preview_augmentation.py:77-97``) — payload in, derived
typed artifact out — like features.py, one Arrow-batched stage.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio
from .features import _frame_matrix

N_MFCC = 13
N_MELS = 20
_SR_OUT = 16000
_FRAME_MS = 25
_HOP_MS = 10
_WIN = 400   # round(25 * 16000 / 1000)
_HOP = 160   # round(10 * 16000 / 1000)

MFCC_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("mfcc_ok", T.BooleanType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_mfcc", T.IntegerType()),
        T.StructField("mfcc_bytes", T.BinaryType()),  # float32 row-major
        T.StructField("c0_mean", T.DoubleType()),
        T.StructField("c1_mean", T.DoubleType()),
        T.StructField("c2_mean", T.DoubleType()),
    ]
)


def _hz_to_mel(f: np.ndarray | float) -> np.ndarray | float:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m: np.ndarray | float) -> np.ndarray | float:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_matrix(
    n_bins: int, n_mels: int = N_MELS, sr: int = _SR_OUT
) -> np.ndarray:
    """(n_bins, n_mels) triangular mel filterbank over [0, sr/2] — the
    standard HTK construction: n_mels+2 mel-equidistant edge frequencies,
    each filter a triangle between its neighbours, evaluated at the FFT bin
    centre frequencies."""
    edges_hz = _mel_to_hz(
        np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2)
    )
    bin_hz = np.arange(n_bins, dtype=np.float64) * (sr / 2.0) / (n_bins - 1)
    m = np.zeros((n_bins, n_mels), dtype=np.float64)
    for k in range(n_mels):
        lo, mid, hi = edges_hz[k], edges_hz[k + 1], edges_hz[k + 2]
        up = (bin_hz - lo) / (mid - lo)
        down = (hi - bin_hz) / (hi - mid)
        m[:, k] = np.maximum(0.0, np.minimum(up, down))
    return m


def dct_matrix(n_mels: int = N_MELS, n_mfcc: int = N_MFCC) -> np.ndarray:
    """(n_mels, n_mfcc) orthonormal DCT-II basis (the scipy
    ``dct(type=2, norm='ortho')`` convention, built from the formula)."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    basis = np.cos(np.pi * np.outer(n + 0.5, k) / n_mels)
    scale = np.full(n_mfcc, np.sqrt(2.0 / n_mels))
    scale[0] = np.sqrt(1.0 / n_mels)
    return basis * scale[None, :]


_MEL = mel_matrix(_WIN // 2 + 1)
_DCT = dct_matrix()
_HANN = np.hanning(_WIN).astype(np.float64)


def clip_mfcc(samples: np.ndarray | None, sr: int) -> np.ndarray | None:
    """float32 samples at ``sr`` → (n_frames, N_MFCC) float32 coefficient
    matrix, or None when undecodable/too short. The SINGLE definition of
    the per-clip math — the Spark UDF below and the oracle-replay fixture
    (fixtures.py) both call it, so fixture equality is bit-exact."""
    if samples is None or len(samples) == 0 or sr <= 0:
        return None
    x = audio.resample_linear(samples, sr, _SR_OUT).astype(np.float64)
    frames = _frame_matrix(x, _WIN, _HOP)
    if frames.shape[0] == 0:
        return None
    spec = np.fft.rfft(frames * _HANN, axis=1)
    power = spec.real**2 + spec.imag**2
    logmel = np.log10(power @ _MEL + 1e-10)
    return (logmel @ _DCT).astype(np.float32)


def mfcc_frames(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → one MFCC-tensor row per decodable
    clip (``mfcc_ok=false`` containment row otherwise, same contract as
    operators/features.py)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in MFCC_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                sr = sr_meas or audio.declared_sr(sr_decl)
                coef = clip_mfcc(samples, sr)
                if coef is None:
                    row = (cid, False, 0, N_MFCC, None, 0.0, 0.0, 0.0)
                else:
                    means = coef.mean(axis=0, dtype=np.float64)
                    row = (
                        cid,
                        True,
                        int(coef.shape[0]),
                        N_MFCC,
                        coef.tobytes(),
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                    )
                for k, v in zip(out, row):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "mfcc_ok": pd.Series(out["mfcc_ok"], dtype=bool),
                    "n_frames": pd.Series(out["n_frames"], dtype=np.int32),
                    "n_mfcc": pd.Series(out["n_mfcc"], dtype=np.int32),
                    "mfcc_bytes": pd.Series(out["mfcc_bytes"], dtype=object),
                    "c0_mean": pd.Series(out["c0_mean"], dtype=np.float64),
                    "c1_mean": pd.Series(out["c1_mean"], dtype=np.float64),
                    "c2_mean": pd.Series(out["c2_mean"], dtype=np.float64),
                }
            )

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        _extract, MFCC_SCHEMA
    )
