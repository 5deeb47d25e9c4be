"""Onset detection — spectral-flux event rate per clip.

The gate family reads energy (VAD), periodicity (pitch), spectral shape
(tonality) and modulation depth (syllable rate); this operator reads EVENT
STRUCTURE — how often new spectral energy appears. Natural speech onsets
arrive at the syllable rate (~2-8/s); steady hum/hiss produce almost none;
music and impulsive noise (keyboard clatter, clicks) produce far more than
speech. The onset rate is the standard novelty signal (Bello et al. 2005,
"A tutorial on onset detection in music signals") and complements the
envelope-FFT syllable gate: the flux looks at WHERE in the spectrum energy
appears, so a pitch glide or noise burst that keeps the envelope flat still
registers.

Per clip: resample to the 8 kHz analysis rate (bounded cost, rate-invariant
bins), frame 32 ms / 10 ms hop, magnitude STFT, half-wave-rectified
spectral flux per frame, then an adaptive threshold — an onset is a LOCAL
MAXIMUM of the flux that clears ``mean + _K_STD * std`` of the clip's own
flux (gain-invariant by construction: flux scales linearly with gain, so
the threshold scales with it). The per-clip math is the shared
``clip_onset`` function, replayed verbatim by the oracle fixture
(fixtures.py) so the DuckDB oracle value-hash-checks the detector
end-to-end.

Spark shape: one ``mapInPandas`` projection on the scan — payload dies in
the worker, ~30 bytes of stats leave, no shuffle (the standard audio-op
contract, operators/features.py:8-14). Undecodable/too-short clips emit
``on_ok=false`` containment rows.

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
_WIN = 256   # 32 ms at 8 kHz
_HOP = 80    # 10 ms
_K_STD = 1.5  # adaptive-threshold width over the clip's own flux
# energy-relative floor: steady content (pure tone, constant hiss) has a
# flux that is pure leakage/estimation ripple — mean + k*std sits inside
# that ripple and would count it as onsets. A real onset injects NEW
# energy comparable to a frame's average magnitude, so the flux must also
# clear this fraction of the mean frame magnitude (measured: a steady
# 440 Hz tone peaks at 4e-5 of it, white noise at 0.37, planted bursts at
# 5.4). Both threshold terms scale linearly with gain → still invariant.
_MIN_E_FRAC = 0.4


ONSET_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("on_ok", T.BooleanType()),
        # on_* prefix throughout, matching the persisted fixture columns
        # and the sibling declip operator's dcl_* convention
        T.StructField("on_frames", T.IntegerType()),
        T.StructField("on_onsets", T.IntegerType()),
        T.StructField("on_rate", T.DoubleType()),
        T.StructField("on_flux_mean", T.DoubleType()),
    ]
)


def clip_onset(
    samples: np.ndarray | None, sr: int
) -> tuple[int, int, float, float] | None:
    """float32 samples → (n_frames, n_onsets, onset_rate_hz, flux_mean), or
    None when undecodable/too short for two frames. SINGLE definition of
    the per-clip math (the Spark UDF and the oracle-replay fixture both
    call it)."""
    if samples is None or len(samples) == 0 or sr <= 0:
        return None
    x = audio.resample_linear(samples, sr, _SR).astype(np.float64)
    frames = _frame_matrix(x, _WIN, _HOP)
    if frames.shape[0] < 2:
        return None
    mag = np.abs(np.fft.rfft(frames * np.hanning(_WIN)[None, :], axis=1))
    # half-wave-rectified spectral flux: energy that APPEARED since the
    # previous frame; decays and steady tones contribute nothing
    flux = np.maximum(mag[1:] - mag[:-1], 0.0).sum(axis=1)
    n_flux = int(flux.shape[0])
    mean = float(flux.mean())
    std = float(flux.std())
    thr = max(mean + _K_STD * std, _MIN_E_FRAC * float(mag.sum(axis=1).mean()))
    left = np.pad(flux[:-1], (1, 0), constant_values=-np.inf)
    right = np.pad(flux[1:], (0, 1), constant_values=-np.inf)
    onsets = (flux > thr) & (flux >= left) & (flux >= right)
    n_onsets = int(onsets.sum())
    # rate over the ANALYZED span (hop-spaced flux frames), so padding /
    # trailing partial windows don't dilute it
    span_s = n_flux * (_HOP / _SR)
    rate = n_onsets / span_s if span_s > 0 else 0.0
    return n_flux, n_onsets, float(rate), mean


def onset_stats(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → one onset-summary row per clip
    (``on_ok=false`` containment row when undecodable/too short)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in ONSET_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                sr = sr_meas or audio.declared_sr(sr_decl)
                res = clip_onset(samples, sr)
                if res is None:
                    row = (cid, False, 0, 0, 0.0, 0.0)
                else:
                    row = (cid, True, *res)
                for k, v in zip(out, row):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "on_ok": pd.Series(out["on_ok"], dtype=bool),
                    "on_frames": pd.Series(out["on_frames"], dtype=np.int32),
                    "on_onsets": pd.Series(out["on_onsets"], dtype=np.int32),
                    "on_rate": pd.Series(out["on_rate"], dtype=np.float64),
                    "on_flux_mean": pd.Series(
                        out["on_flux_mean"], dtype=np.float64
                    ),
                }
            )

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        _extract, ONSET_SCHEMA
    )
