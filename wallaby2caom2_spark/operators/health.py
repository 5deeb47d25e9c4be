"""Waveform-health gate — DC offset and crest factor per clip.

Two one-pass time-domain statistics catch acquisition-chain faults the
spectral gates are blind to. A DC OFFSET (non-zero waveform mean) is the
signature of a mis-biased A/D front-end or a broken codec chain — it wastes
headroom, breaks zero-crossing features, and thumps on playback. The CREST
FACTOR (peak-to-RMS ratio in dB) is the standard dynamics health read:
natural speech sits well above compressed material; hard limiting /
clipping / aggressive loudness processing crushes it, and a crushed crest
predicts ASR-hostile distortion even when the clip-ratio rule (cascade
``audio_clipping``) does not fire because the peaks were normalized back
down after limiting.

Per clip: ``dc = mean(x)``, ``crest_db = 20·log10(peak/rms)`` on the raw
float samples. Containment (``wh_ok=false``): undecodable or RMS below the
silence floor (crest of silence is meaningless).

Spark shape: one ``mapInPandas`` projection on the scan — payload dies in
the worker, three doubles leave, band classification is codegen. The
per-clip math is the shared ``clip_health`` function, replayed verbatim by
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

_SILENCE_RMS = 1e-5  # below this the crest factor is meaningless

HEALTH_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("wh_ok", T.BooleanType()),
        T.StructField("dc_offset", T.DoubleType()),
        T.StructField("crest_db", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)


def clip_health(
    samples: np.ndarray | None,
) -> tuple[float, float, float] | None:
    """float32 samples → (dc_offset, crest_db, peak), or None when
    undecodable / silent. SINGLE definition of the per-clip math
    (Spark UDF + oracle fixture)."""
    if samples is None or len(samples) == 0:
        return None
    rms = float(np.sqrt(np.mean(np.square(samples, dtype=np.float64))))
    if rms < _SILENCE_RMS:
        return None
    dc = float(np.mean(samples, dtype=np.float64))
    peak = float(np.max(np.abs(samples)))
    crest_db = 20.0 * float(np.log10(peak / rms))
    return dc, crest_db, peak


def health_stats(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec) → one waveform-health row per clip
    (``wh_ok=false`` containment row when undecodable/silent)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in HEALTH_SCHEMA}
            for cid, raw, codec in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"]
            ):
                samples, _sr = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                res = clip_health(samples)
                if res is None:
                    row = (cid, False, 0.0, 0.0, 0.0)
                else:
                    row = (cid, True, *res)
                for k, v in zip(out, row):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "wh_ok": pd.Series(out["wh_ok"], dtype=bool),
                    "dc_offset": pd.Series(out["dc_offset"], dtype=np.float64),
                    "crest_db": pd.Series(out["crest_db"], dtype=np.float64),
                    "peak": pd.Series(out["peak"], dtype=np.float64),
                }
            )

    return df.select("clip_id", "bytes", "codec").mapInPandas(
        _extract, HEALTH_SCHEMA
    )
