"""Mains-hum gate — 50/60 Hz narrowband contamination detector.

Ground-loop hum is the most common electrical defect in crawled audio: a
50 Hz (EU) or 60 Hz (US) fundamental plus its low harmonics riding under
the program material. It is inaudible in a waveform thumbnail and
invisible to every metadata column, but it poisons downstream features
(MFCC C0/C1, pitch trackers locking onto the hum) — corpus QC screens it
before feature extraction.

The detector is a Goertzel-style single-bin DFT at the two mains families
(50/100/150/200 Hz and 60/120/180/240 Hz) over the whole DC-removed clip:
each bin's amplitude estimate ``2|X(f)|/N`` converts to the mean-square
power a pure component at that frequency would contribute, the stronger
family wins, and the hum ratio is that family's power share of the total.
Exact single-frequency projection beats an FFT here — no zero-padding to a
power of two, no bin straddling at arbitrary sample rates, and only eight
frequencies are ever evaluated.

Spark shape: one ``mapInPandas`` projection on the scan — payload dies in
the worker, a flag + two doubles + two ints leave, no shuffle. The
per-clip math is the shared ``clip_hum`` function, replayed verbatim into
the oracle fixture (fixtures.py) so the DuckDB oracle value-hash-checks
the gate.

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

_FAMILIES = {50: (50.0, 100.0, 150.0, 200.0), 60: (60.0, 120.0, 180.0, 240.0)}
_POWER_FLOOR = 1e-12
# a single bin above 1% of total power counts as a present harmonic
_HARMONIC_SHARE = 0.01
# need all family bins strictly below Nyquist with some margin
_MIN_SR = 600

HUM_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("hum_ok", T.BooleanType()),
        T.StructField("hum_hz", T.IntegerType()),
        T.StructField("hum_ratio", T.DoubleType()),
        T.StructField("hum_harmonics", T.IntegerType()),
    ]
)


def clip_hum(
    samples: np.ndarray | None, sr: int
) -> tuple[int, float, int] | None:
    """float32 samples at ``sr`` → (hum_hz, hum_ratio, n_harmonics), or
    None when undecodable / silent / rate too low to resolve the families.
    SINGLE definition of the per-clip math (Spark UDF + oracle fixture)."""
    if samples is None or len(samples) == 0 or sr < _MIN_SR:
        return None
    x = samples.astype(np.float64)
    x = x - x.mean()
    total = float(np.mean(x * x))
    if total <= _POWER_FLOOR:
        return None
    n = len(x)
    k = np.arange(n, dtype=np.float64)

    def _component_power(f: float) -> float:
        # exact single-frequency DFT projection; for a pure A·sin(2πft)
        # this returns A²/2 — its mean-square power contribution
        phase = -2.0j * np.pi * f / sr * k
        amp = 2.0 * abs(np.sum(x * np.exp(phase))) / n
        return amp * amp / 2.0

    best = None
    for hz, fam in _FAMILIES.items():
        powers = [_component_power(f) for f in fam]
        fam_power = sum(powers)
        harm = sum(1 for p in powers if p > _HARMONIC_SHARE * total)
        if best is None or fam_power > best[1]:
            best = (hz, fam_power, harm)
    hz, fam_power, harm = best
    return hz, float(min(fam_power / total, 1.0)), int(harm)


def hum_stats(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → one hum row per clip
    (``hum_ok=false`` containment row when unmeasurable)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in HUM_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                sr = sr_meas or audio.declared_sr(sr_decl)
                res = clip_hum(samples, sr)
                if res is None:
                    row = (cid, False, 0, 0.0, 0)
                else:
                    row = (cid, True, *res)
                for key, v in zip(out, row):
                    out[key].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "hum_ok": pd.Series(out["hum_ok"], dtype=bool),
                    "hum_hz": pd.Series(out["hum_hz"], dtype=np.int32),
                    "hum_ratio": pd.Series(out["hum_ratio"], dtype=np.float64),
                    "hum_harmonics": pd.Series(
                        out["hum_harmonics"], dtype=np.int32
                    ),
                }
            )

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        _extract, HUM_SCHEMA
    )
