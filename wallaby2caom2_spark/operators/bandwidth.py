"""Effective-bandwidth gate — spectral rolloff vs declared Nyquist.

A web-crawled audio corpus is full of clips whose CONTAINER rate overstates
their CONTENT: 8 kHz telephone audio naively resampled to 16/44.1 kHz,
lossy-codec survivors with a hard low-pass shelf, silence-padded synthetic
rates. Storage-side metadata cannot see this — only the spectrum can. Per
clip this operator measures where the energy actually lives (the classic
rolloff statistic: the frequency below which 95% / 99% of total power sits)
and flags clips whose occupied band is a small fraction of the declared
Nyquist — the "upsample suspect" rule corpus QC applies before trusting
sample-rate-derived features.

Unlike spectral.py (which decimates to a fixed 4 kHz analysis band for
rate-invariant SHAPE statistics), bandwidth must analyze the clip at its
own full rate — the whole point is comparing content occupancy against the
declared Nyquist. FFT cost stays bounded: 32 ms windows at 48 kHz are
1536-sample frames, zero-padded to the next power of two (the fingerprint's
pow2 discipline, functions/audio.py).

Spark shape: one ``mapInPandas`` projection on the scan — payload dies in
the worker, three doubles and a flag leave, no shuffle. The per-clip math
is the shared ``clip_bandwidth`` function, replayed verbatim by the oracle
fixture (fixtures.py) so the DuckDB oracle value-hash-checks the gate.

Reference analog: the metadata sanity-visitor family
(``wallaby2caom2/main_app.py:153-170``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio
from .features import _frame_matrix

_FRAME_MS = 32
_HOP_MS = 16
_POWER_FLOOR = 1e-10
# occupied band below a quarter of declared Nyquist → upsample suspect
_SUSPECT_RATIO = 0.25

BANDWIDTH_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("bw_ok", T.BooleanType()),
        T.StructField("rolloff95_hz", T.DoubleType()),
        T.StructField("rolloff99_hz", T.DoubleType()),
        T.StructField("bw_ratio", T.DoubleType()),
        T.StructField("upsample_suspect", T.BooleanType()),
    ]
)


def clip_bandwidth(
    samples: np.ndarray | None, sr: int
) -> tuple[float, float, float, bool] | None:
    """float32 samples at ``sr`` → (rolloff95_hz, rolloff99_hz, bw_ratio,
    upsample_suspect), or None when undecodable / too short / silent.
    SINGLE definition of the per-clip math (Spark UDF + oracle fixture)."""
    if samples is None or len(samples) == 0 or sr <= 0:
        return None
    win = max(1, int(round(sr * _FRAME_MS / 1000.0)))
    hop = max(1, int(round(sr * _HOP_MS / 1000.0)))
    frames = _frame_matrix(samples.astype(np.float64), win, hop)
    if frames.shape[0] == 0:
        return None
    frames = frames - frames.mean(axis=1, keepdims=True)
    nfft = 1 << int(np.ceil(np.log2(max(win, 2))))
    hann = np.hanning(win)
    spec = np.fft.rfft(frames * hann, n=nfft, axis=1)
    power = (spec.real**2 + spec.imag**2).mean(axis=0)[1:]  # Welch, no DC
    total = power.sum()
    if total <= _POWER_FLOOR:
        return None
    cum = np.cumsum(power) / total
    # bin k (1-based after DC drop) → frequency (k+1) * sr / nfft
    bin_hz = np.arange(1, len(power) + 1, dtype=np.float64) * sr / nfft
    r95 = float(bin_hz[int(np.searchsorted(cum, 0.95))])
    r99 = float(bin_hz[int(np.searchsorted(cum, 0.99))])
    nyquist = sr / 2.0
    ratio = r95 / nyquist
    return r95, r99, float(ratio), bool(ratio < _SUSPECT_RATIO)


def bandwidth_stats(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → one bandwidth row per clip
    (``bw_ok=false`` containment row when undecodable/too short/silent)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in BANDWIDTH_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                sr = sr_meas or audio.declared_sr(sr_decl)
                res = clip_bandwidth(samples, sr)
                if res is None:
                    row = (cid, False, 0.0, 0.0, 0.0, False)
                else:
                    row = (cid, True, *res)
                for k, v in zip(out, row):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "bw_ok": pd.Series(out["bw_ok"], dtype=bool),
                    "rolloff95_hz": pd.Series(
                        out["rolloff95_hz"], dtype=np.float64
                    ),
                    "rolloff99_hz": pd.Series(
                        out["rolloff99_hz"], dtype=np.float64
                    ),
                    "bw_ratio": pd.Series(out["bw_ratio"], dtype=np.float64),
                    "upsample_suspect": pd.Series(
                        out["upsample_suspect"], dtype=bool
                    ),
                }
            )

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        _extract, BANDWIDTH_SCHEMA
    )
