"""F0 (pitch) estimation — normalized-autocorrelation tracker per clip.

The quality-filter family reads energy (VAD), spectral shape (tonality) and
modulation (dropout); this operator reads PERIODICITY — the voicing signal
an ASR/TTS corpus uses to separate speech-like clips from hum, hiss and
music beds, and to sanity-check speaker consistency (a clip whose "speech"
carries no voiced frames at all is a transcript/audio mismatch candidate).

Per clip: resample to a fixed 8 kHz analysis rate (bounded cost on hi-rate
audio, rate-invariant lags), frame 40 ms / 20 ms hop, and per frame compute
the normalized autocorrelation over the 50-400 Hz lag range (20-160 samples
at 8 kHz) via one batched FFT autocorrelation over the whole frame matrix.
A frame is VOICED when its peak NACF clears 0.55 and its energy clears the
silence floor; the clip summary is (n_frames, n_voiced, voiced_ratio,
mean_f0 over voiced frames). All numpy-from-formulas — the per-clip math is
the shared ``clip_pitch`` function, replayed verbatim by the oracle fixture
(fixtures.py), so the DuckDB oracle value-hash-checks the tracker
end-to-end.

Spark shape: one ``mapInPandas`` projection on the scan — payload dies in
the worker, ~30 bytes of stats leave, no shuffle (the standard audio-op
contract, operators/features.py:8-14). Undecodable/too-short clips emit
``pitch_ok=false`` containment rows.

Reference analog: the metadata sanity-visitor family
(``wallaby2caom2/main_app.py:153-170``) — payload in, typed quality
signals out, never fail the batch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio
from .features import _frame_matrix

_SR = 8000
_WIN = 320   # 40 ms
_HOP = 160   # 20 ms
_LAG_MIN = 20   # 400 Hz
_LAG_MAX = 160  # 50 Hz
_NACF_MIN = 0.55
_ENERGY_FLOOR = 1e-6  # mean-square floor, same scale as spectral.py's

PITCH_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("pitch_ok", T.BooleanType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_voiced", T.IntegerType()),
        T.StructField("voiced_ratio", T.DoubleType()),
        T.StructField("mean_f0", T.DoubleType()),
    ]
)


def clip_pitch(
    samples: np.ndarray | None, sr: int
) -> tuple[int, int, float, float] | None:
    """float32 samples → (n_frames, n_voiced, voiced_ratio, mean_f0_hz), or
    None when undecodable/too short. SINGLE definition of the per-clip math
    (the Spark UDF and the oracle-replay fixture both call it)."""
    if samples is None or len(samples) == 0 or sr <= 0:
        return None
    x = audio.resample_linear(samples, sr, _SR).astype(np.float64)
    frames = _frame_matrix(x, _WIN, _HOP)
    if frames.shape[0] == 0:
        return None
    frames = frames - frames.mean(axis=1, keepdims=True)
    energy = (frames**2).mean(axis=1)
    # batched FFT autocorrelation: r[t] = IFFT(|FFT(x)|^2); zero-pad to the
    # next pow2 ≥ 2*win so the circular correlation is linear on [0, win)
    nfft = 1024  # 2 * 512 ≥ 2 * 320
    spec = np.fft.rfft(frames, n=nfft, axis=1)
    r = np.fft.irfft(spec.real**2 + spec.imag**2, n=nfft, axis=1)
    r0 = r[:, 0]
    safe_r0 = np.where(r0 > 0.0, r0, 1.0)
    # unbiased window correction: the linear autocorrelation of a
    # stationary periodic frame decays as (win-lag)/win — undo it so a
    # low-F0 frame (lag 160 of win 320: raw peak ≤ 0.5) still clears the
    # voicing threshold its high-F0 twin clears
    lags = np.arange(_LAG_MIN, _LAG_MAX + 1, dtype=np.float64)
    unbias = _WIN / (_WIN - lags)
    nacf = r[:, _LAG_MIN : _LAG_MAX + 1] / safe_r0[:, None] * unbias[None, :]
    best = nacf.max(axis=1)
    # octave-error guard: a periodic frame peaks equally at every multiple
    # of its true lag (the unbias correction can even tilt argmax toward a
    # subharmonic) — take the smallest LOCAL MAXIMUM within 90% of the
    # global peak (the threshold alone would bias early onto the first
    # peak's low-frequency shoulder), falling back to the global argmax
    # when no interior local max qualifies
    left = np.pad(nacf[:, :-1], ((0, 0), (1, 0)), constant_values=-np.inf)
    right = np.pad(nacf[:, 1:], ((0, 0), (0, 1)), constant_values=-np.inf)
    cand = (nacf >= left) & (nacf >= right) & (nacf >= 0.9 * best[:, None])
    has_cand = cand.any(axis=1)
    best_lag_rel = np.where(
        has_cand, cand.argmax(axis=1), nacf.argmax(axis=1)
    )
    voiced = (best >= _NACF_MIN) & (energy >= _ENERGY_FLOOR) & (r0 > 0.0)
    n_frames = int(frames.shape[0])
    n_voiced = int(voiced.sum())
    ratio = n_voiced / n_frames
    if n_voiced:
        f0 = _SR / (best_lag_rel[voiced] + _LAG_MIN)
        mean_f0 = float(f0.mean())
    else:
        mean_f0 = 0.0
    return n_frames, n_voiced, float(ratio), mean_f0


def pitch_stats(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → one pitch-summary row per clip
    (``pitch_ok=false`` containment row when undecodable/too short)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in PITCH_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                sr = sr_meas or audio.declared_sr(sr_decl)
                res = clip_pitch(samples, sr)
                if res is None:
                    row = (cid, False, 0, 0, 0.0, 0.0)
                else:
                    row = (cid, True, *res)
                for k, v in zip(out, row):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "pitch_ok": pd.Series(out["pitch_ok"], dtype=bool),
                    "n_frames": pd.Series(out["n_frames"], dtype=np.int32),
                    "n_voiced": pd.Series(out["n_voiced"], dtype=np.int32),
                    "voiced_ratio": pd.Series(
                        out["voiced_ratio"], dtype=np.float64
                    ),
                    "mean_f0": pd.Series(out["mean_f0"], dtype=np.float64),
                }
            )

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        _extract, PITCH_SCHEMA
    )
