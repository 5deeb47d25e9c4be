"""Acoustic syllable-rate gate — envelope modulation spectrum vs transcript.

A web-crawled speech corpus's worst label noise is not a bad SIGNAL but a
WRONG TRANSCRIPT: the audio is fine, the text is fine, they just do not
belong together (mis-aligned subtitle dumps, shifted segment boundaries,
wholesale page-text pairing). Neither the audio gates nor the text gates
can see this — only a cross-modal consistency check can. The cheapest
reliable acoustic speaking-rate estimate is the envelope modulation
spectrum: speech energy is amplitude-modulated at the syllabic rate
(~2-10 Hz, peaking near 4 Hz — Houtgast & Steeneken's modulation-transfer
work and the speech-rhythm literature, e.g. Tilsen & Johnson 2008), so the
dominant peak of the FFT of the frame-energy envelope IS the syllable rate,
no ASR needed. Comparing it against the transcript's character rate (a
fixed chars-per-syllable prior) flags pairs whose text could not plausibly
be a transcription of that audio.

Per clip: 10 ms non-overlapping RMS envelope (~100 Hz envelope rate) →
demean → Hann → pow2-padded rFFT → dominant bin in the 2-10 Hz syllabic
band + that band's share of total modulation power (drift below 0.5 Hz
excluded). Containment (``syl_ok=false``): undecodable, silent, or shorter
than 64 envelope frames (~0.64 s — below that the FFT cannot resolve the
syllabic band).

Spark shape: one ``mapInPandas`` projection on the scan — payload dies in
the worker; five slim columns leave; the downstream band/agreement
classification is pure codegen. The per-clip math is the shared
``clip_syllable`` function, replayed verbatim by the oracle fixture
(fixtures.py) so the DuckDB oracle value-hash-checks the gate.

Reference analog: the metadata consistency-visitor family
(``wallaby2caom2/main_app.py:153-170``) — cross-field sanity checks before
a record is trusted.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio
from .features import _frame_matrix

_ENV_FRAME_S = 0.010  # 10 ms non-overlapping energy envelope (~100 Hz)
_MIN_ENV_FRAMES = 64  # < ~0.64 s cannot resolve the syllabic band
_BAND_LO_HZ = 2.0
_BAND_HI_HZ = 10.0
_DRIFT_HZ = 0.5  # envelope power below this is level drift, not rhythm
_POWER_FLOOR = 1e-10

SYLLABLE_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("syl_ok", T.BooleanType()),
        T.StructField("syl_rate_hz", T.DoubleType()),
        T.StructField("mod_share", T.DoubleType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("n_chars", T.IntegerType()),
    ]
)


def clip_syllable(
    samples: np.ndarray | None, sr: int
) -> tuple[float, float, int] | None:
    """float32 samples at ``sr`` → (syl_rate_hz, mod_share, dur_ms), or None
    when undecodable / too short / silent. SINGLE definition of the
    per-clip math (Spark UDF + oracle fixture)."""
    if samples is None or len(samples) == 0 or sr <= 0:
        return None
    dur_ms = int(round(len(samples) * 1000.0 / sr))
    hop = max(1, int(round(sr * _ENV_FRAME_S)))
    frames = _frame_matrix(samples.astype(np.float64), hop, hop)
    if frames.shape[0] < _MIN_ENV_FRAMES:
        return None
    env = np.sqrt(np.square(frames).mean(axis=1))
    env = env - env.mean()
    if np.square(env).sum() <= _POWER_FLOOR:
        return None
    n = len(env)
    nfft = max(256, 1 << int(np.ceil(np.log2(n))))
    env_sr = sr / hop
    spec = np.fft.rfft(env * np.hanning(n), n=nfft)
    power = spec.real**2 + spec.imag**2
    freqs = np.arange(len(power), dtype=np.float64) * env_sr / nfft
    band = (freqs >= _BAND_LO_HZ) & (freqs <= _BAND_HI_HZ)
    total_mask = freqs >= _DRIFT_HZ
    total = power[total_mask].sum()
    if not band.any() or total <= _POWER_FLOOR:
        return None
    k = int(np.argmax(np.where(band, power, 0.0)))
    return float(freqs[k]), float(power[band].sum() / total), dur_ms


def syllable_stats(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz, transcript) → one syllable-rate row
    per clip (``syl_ok=false`` containment row when undecodable / silent /
    too short; ``n_chars`` rides along for the agreement classification)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in SYLLABLE_SCHEMA}
            for cid, raw, codec, sr_decl, transcript in zip(
                pdf["clip_id"],
                pdf["bytes"],
                pdf["codec"],
                pdf["sr_hz"],
                pdf["transcript"],
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                sr = sr_meas or audio.declared_sr(sr_decl)
                res = clip_syllable(samples, sr)
                n_chars = len(transcript) if transcript is not None else 0
                if res is None:
                    row = (cid, False, 0.0, 0.0, 0, n_chars)
                else:
                    row = (cid, True, res[0], res[1], res[2], n_chars)
                for k, v in zip(out, row):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "syl_ok": pd.Series(out["syl_ok"], dtype=bool),
                    "syl_rate_hz": pd.Series(
                        out["syl_rate_hz"], dtype=np.float64
                    ),
                    "mod_share": pd.Series(out["mod_share"], dtype=np.float64),
                    "dur_ms": pd.Series(out["dur_ms"], dtype=np.int32),
                    "n_chars": pd.Series(out["n_chars"], dtype=np.int32),
                }
            )

    return df.select(
        "clip_id", "bytes", "codec", "sr_hz", "transcript"
    ).mapInPandas(_extract, SYLLABLE_SCHEMA)
