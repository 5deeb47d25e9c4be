"""Spectral-shape quality signals — tonal-artifact detection per clip.

Energy VAD (operators/vad.py) answers "is there modulation"; this operator
answers "is the energy BROADBAND like speech, or concentrated like a test
tone / mains hum / feedback whistle" — the failure mode energy gates cannot
see, because a loud 1 kHz sine modulated on and off passes both the level
and the dynamics checks. Training corpora scrub these clips: they carry a
transcript but no phonetic content.

Per clip, a Welch-averaged power spectrum at a fixed 4 kHz analysis rate
(decimate first — same rationale as the fingerprint's analysis band:
bounded FFT cost on hi-rate audio, rate-invariant statistics), then three
classic shape statistics:

* ``flatness``  — geometric/arithmetic mean ratio of the spectrum
                  (Wiener entropy): →1 for white noise, →0 for a pure tone.
* ``centroid_hz`` — power-weighted mean frequency.
* ``peak_share``  — the dominant bin's share of total power; a sine puts
                  ~all power in one bin regardless of level.

Spark shape: one ``mapInPandas`` projection on the scan — payload dies in
the worker, ~40 bytes/clip of stats come out, no shuffle. All math is
vectorized over the clip's frame matrix (strided view + one batched rFFT).
Undecodable / rateless / too-short clips emit ``spec_ok = false``
containment rows, same contract as the other audio operators.

Reference analog: the metadata "sanity visitor" family
(``wallaby2caom2/main_app.py:153-170``) — payload in, typed quality signals
out, never fail the batch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio
from .features import _frame_matrix

SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("spec_ok", T.BooleanType()),
        T.StructField("flatness", T.DoubleType()),
        T.StructField("centroid_hz", T.DoubleType()),
        T.StructField("peak_share", T.DoubleType()),
    ]
)

_ANALYSIS_SR = 4000
_FRAME_MS = 32
_HOP_MS = 16
# absolute power floor (mean square of float samples in [-1,1]): below this
# the spectrum is rounding noise and shape statistics are meaningless
_POWER_FLOOR = 1e-8


def _clip_spectrum(x: np.ndarray, sr: int) -> tuple[float, float, float] | None:
    """float32 samples → (flatness, centroid_hz, peak_share), or None when
    the clip has no usable spectrum (too short / silent)."""
    if sr > _ANALYSIS_SR:
        x = audio.resample_linear(x, sr, _ANALYSIS_SR)
        sr = _ANALYSIS_SR
    # max(1, ...): a parseable header can declare ANY nonzero rate; sr < 32
    # would round hop to 0 and ZeroDivisionError the whole batch (same guard
    # as vad.py) — the degenerate 1-sample window then yields no usable
    # spectrum and falls through to the containment row below
    win = max(1, int(round(sr * _FRAME_MS / 1000.0)))
    hop = max(1, int(round(sr * _HOP_MS / 1000.0)))
    frames = _frame_matrix(x.astype(np.float64), win, hop)
    if frames.shape[0] == 0:
        return None
    frames = frames - frames.mean(axis=1, keepdims=True)  # per-frame DC kill
    hann = np.hanning(win)
    spec = np.fft.rfft(frames * hann, axis=1)
    power = (spec.real**2 + spec.imag**2).mean(axis=0)[1:]  # Welch avg, no DC
    total = float(power.sum())
    if total <= _POWER_FLOOR * len(power):
        return None
    p = power / total
    # flatness on the normalized spectrum with a floor so empty bins don't
    # drive the geometric mean to exactly 0 (log of the floor, not -inf)
    flat = float(np.exp(np.mean(np.log(np.maximum(p, 1e-12)))) / np.mean(p))
    # bin k of an rfft over `win` samples sits at k*sr/win; deriving the
    # step from len(power) (= win//2) instead would skew every frequency
    # by win/(win-1) whenever the window length is odd (e.g. 44.1 kHz
    # clips: round(44100*0.032) = 1411)
    freqs = np.arange(1, len(power) + 1) * (float(sr) / win)
    centroid = float((freqs * p).sum())
    peak = float(p.max())
    return flat, centroid, peak


def spectral_stats(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → per-clip spectral-shape stats."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            flat = np.zeros(n, dtype=np.float64)
            cent = np.zeros(n, dtype=np.float64)
            peak = np.zeros(n, dtype=np.float64)
            for i, (raw, codec, sr_decl) in enumerate(
                zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"])
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                if samples is None or len(samples) == 0:
                    continue
                sr = sr_meas or audio.declared_sr(sr_decl)
                if sr <= 0:
                    continue
                res = _clip_spectrum(samples, sr)
                if res is None:
                    continue
                ok[i] = True
                flat[i], cent[i], peak[i] = res
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "spec_ok": ok,
                    "flatness": np.round(flat + 1e-12, 6),
                    "centroid_hz": np.round(cent + 1e-9, 2),
                    "peak_share": np.round(peak + 1e-12, 6),
                }
            )

    cols = ["clip_id", "bytes", "codec", "sr_hz"]
    return df.select(*cols).mapInPandas(_run, SPECTRAL_SCHEMA)


# tonal-artifact decision boundary — the single source for BOTH the
# standalone tonality gate and the curation funnel (plans/curate.py), so
# recalibration cannot silently de-synchronize them
TONAL_PEAK_SHARE = 0.5
TONAL_FLATNESS = 0.05
_NARROWBAND_PEAK = 0.2


def tonal_artifact_cond():
    """Codegen predicate: spec_ok AND dominant-bin majority AND near-zero
    Wiener entropy — the 'test tone / hum / whistle' decision."""
    from pyspark.sql import functions as F

    return (
        F.col("spec_ok")
        & (F.col("peak_share") > TONAL_PEAK_SHARE)
        & (F.col("flatness") < TONAL_FLATNESS)
    )


def classify_tonality(stats: DataFrame) -> DataFrame:
    """Spectral stats → tonality class (codegen cascade, no Python):
    ``no_signal`` | ``tonal_artifact`` (hum/test tone/whistle) |
    ``narrowband`` (suspicious concentration) | ``broadband`` (speech-like).
    """
    from pyspark.sql import functions as F

    cls = (
        F.when(~F.col("spec_ok"), "no_signal")
        .when(tonal_artifact_cond(), "tonal_artifact")
        .when(F.col("peak_share") > _NARROWBAND_PEAK, "narrowband")
        .otherwise("broadband")
    )
    return stats.withColumn("tonality", cls)
