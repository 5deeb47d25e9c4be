"""Declip repair — cubic-Hermite reconstruction of saturated runs.

The audio analog of the reference's declarative VALUE REPAIR (P15,
``wallaby2caom2/main_app.py:84-96``: find a known-bad value, substitute a
repaired one): hard-clipped spans (runs of samples pinned at the int16
ceiling — the same ``|x| >= 32766`` saturation rule the decode stage's
``clip_rate`` counts) are detected and re-drawn with a cubic Hermite
segment anchored two samples outside the run on each side, so the repaired
waveform continues the entry/exit slopes and bulges above the ceiling the
way the original peak did. Interpolation cannot recover the true signal —
the operator reports HOW MUCH it changed (samples repaired, energy added,
post-repair peak) so downstream stages can decide whether the clip is
salvageable or the ``audio_clipping`` drop rule should keep it dropped.

Per-clip math is the shared ``clip_declip`` function, replayed verbatim by
the oracle fixture (fixtures.py) so the DuckDB oracle value-hash-checks the
repair end-to-end.

Spark shape: one ``mapInPandas`` projection on the scan — payload dies in
the worker, ~40 bytes of stats leave, no shuffle (the standard audio-op
contract). Undecodable clips emit ``dcl_ok=false`` containment rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio

_CLIP_T = 32766  # saturation threshold — decode_features' clip_rate rule
_MIN_RUN = 2     # 1-sample touches are legitimate peaks, not saturation


DECLIP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("dcl_ok", T.BooleanType()),
        T.StructField("dcl_runs", T.IntegerType()),
        T.StructField("dcl_samples", T.IntegerType()),
        T.StructField("dcl_frac", T.DoubleType()),
        T.StructField("dcl_energy_db", T.DoubleType()),
        T.StructField("dcl_peak", T.DoubleType()),
    ]
)


def _saturated_runs(x16: np.ndarray) -> list[tuple[int, int]]:
    """[start, end] (inclusive) runs of ≥ _MIN_RUN saturated samples that
    have two clean anchor samples on each side (boundary runs can't be
    interpolated and are left as-is)."""
    sat = (x16 >= _CLIP_T) | (x16 <= -_CLIP_T)
    if not sat.any():
        return []
    d = np.diff(sat.astype(np.int8))
    starts = list(np.where(d == 1)[0] + 1)
    ends = list(np.where(d == -1)[0])
    if sat[0]:
        starts.insert(0, 0)
    if sat[-1]:
        ends.append(len(x16) - 1)
    n = len(x16)
    return [
        (s, e)
        for s, e in zip(starts, ends)
        if e - s + 1 >= _MIN_RUN and s >= 2 and e <= n - 3
    ]


def clip_declip(
    x16: np.ndarray | None, sr: int
) -> tuple[int, int, float, float, float] | None:
    """int16 samples → (n_runs, n_samples, frac_repaired, energy_added_db,
    peak_after_fullscale), or None when undecodable. SINGLE definition of
    the per-clip math (the Spark UDF and the oracle-replay fixture both
    call it)."""
    if x16 is None or len(x16) == 0 or sr <= 0:
        return None
    x = x16.astype(np.float64)
    runs = _saturated_runs(x16)
    e_before = float(np.sum(x * x))
    n_fixed = 0
    for s, e in runs:
        m = e - s + 1
        p0, p1 = x[s - 1], x[e + 1]
        # per-t derivatives: sample slope × span (t covers m+1 sample steps)
        m0 = (x[s - 1] - x[s - 2]) * (m + 1)
        m1 = (x[e + 2] - x[e + 1]) * (m + 1)
        t = np.arange(1, m + 1, dtype=np.float64) / (m + 1)
        t2, t3 = t * t, t * t * t
        h = (
            (2 * t3 - 3 * t2 + 1) * p0
            + (t3 - 2 * t2 + t) * m0
            + (-2 * t3 + 3 * t2) * p1
            + (t3 - t2) * m1
        )
        x[s : e + 1] = h
        n_fixed += m
    e_after = float(np.sum(x * x))
    energy_db = (
        10.0 * float(np.log10(e_after / e_before))
        if e_before > 0.0 and e_after > 0.0
        else 0.0
    )
    peak = float(np.max(np.abs(x)) / audio._FULL_SCALE) if len(x) else 0.0
    return (
        len(runs),
        n_fixed,
        float(n_fixed / len(x)),
        energy_db,
        peak,
    )


def declip_stats(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → one repair-report row per clip
    (``dcl_ok=false`` containment row when undecodable)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in DECLIP_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                x16, sr_meas = audio.decode_clip_i16(raw, codec)
                sr = sr_meas or audio.declared_sr(sr_decl)
                res = clip_declip(x16, sr)
                if res is None:
                    row = (cid, False, 0, 0, 0.0, 0.0, 0.0)
                else:
                    row = (cid, True, *res)
                for k, v in zip(out, row):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "dcl_ok": pd.Series(out["dcl_ok"], dtype=bool),
                    "dcl_runs": pd.Series(out["dcl_runs"], dtype=np.int32),
                    "dcl_samples": pd.Series(
                        out["dcl_samples"], dtype=np.int32
                    ),
                    "dcl_frac": pd.Series(out["dcl_frac"], dtype=np.float64),
                    "dcl_energy_db": pd.Series(
                        out["dcl_energy_db"], dtype=np.float64
                    ),
                    "dcl_peak": pd.Series(out["dcl_peak"], dtype=np.float64),
                }
            )

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        _extract, DECLIP_SCHEMA
    )
