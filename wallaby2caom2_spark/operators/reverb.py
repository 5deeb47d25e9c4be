"""Reverberation gate — energy-decay slope after the loudest moment.

Room acoustics survive every metadata field: a clip recorded in a stairwell
carries seconds of smeared tail no container column admits to, and heavy
reverb is one of the strongest predictors of ASR label noise in crawled
speech corpora. The classic proxy needs no reference signal: frame the
energy envelope, find the loudest frame, and fit a least-squares line to
the dB envelope of everything after it. The slope (dB/s) is the decay
rate; ``RT60 ≈ 60 / -slope`` converts it to the familiar
reverberation-time scale. Dry close-mic speech decays fast between
syllables (steep slope, small RT60 proxy); a live room drags the tail out;
a clip whose envelope never decays at all (sustained tone, constant noise
bed) is reported as ``no-decay`` rather than pretending a reverberation
time exists.

Spark shape: one ``mapInPandas`` projection on the scan — payload dies in
the worker, three doubles and a flag leave, no shuffle. The per-clip math
is the shared ``clip_reverb`` function, replayed verbatim into the oracle
fixture (fixtures.py) so the DuckDB oracle value-hash-checks the gate.

Reference analog: the metadata sanity-visitor family
(``wallaby2caom2/main_app.py:153-170``) — content-derived QC the stored
metadata cannot express.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio
from .features import _frame_matrix

_FRAME_MS = 20
_HOP_MS = 10
_POWER_FLOOR = 1e-12
_MIN_TAIL_FRAMES = 8
# envelopes flatter than this never produce a meaningful RT60
_NO_DECAY_SLOPE_DB_S = -1.0
# fit only the first 40 dB of decay (T30-style truncation): once the tail
# reaches the noise/quantization floor it goes flat and would bias the
# least-squares line toward no-decay
_FIT_RANGE_DB = 40.0

REVERB_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("rev_ok", T.BooleanType()),
        T.StructField("decay_db_s", T.DoubleType()),
        T.StructField("rt60_ms", T.DoubleType()),
        T.StructField("tail_ms", T.DoubleType()),
    ]
)


def clip_reverb(
    samples: np.ndarray | None, sr: int
) -> tuple[float, float, float] | None:
    """float32 samples at ``sr`` → (decay_db_s, rt60_ms, tail_ms), or None
    when undecodable / silent / too short to fit a decay line.
    ``decay_db_s`` is the least-squares slope of the dB energy envelope
    after its peak frame; ``rt60_ms = 60000 / -slope`` when the envelope
    actually decays (slope below -1 dB/s), else 0.0 (no-decay sentinel).
    SINGLE definition of the per-clip math (Spark UDF + oracle fixture)."""
    if samples is None or len(samples) == 0 or sr <= 0:
        return None
    win = max(1, int(round(sr * _FRAME_MS / 1000.0)))
    hop = max(1, int(round(sr * _HOP_MS / 1000.0)))
    frames = _frame_matrix(samples.astype(np.float64), win, hop)
    if frames.shape[0] == 0:
        return None
    power = np.mean(frames * frames, axis=1)
    if float(power.max()) <= _POWER_FLOOR:
        return None
    env_db = 10.0 * np.log10(np.maximum(power, _POWER_FLOOR))
    peak = int(np.argmax(env_db))
    tail = env_db[peak:]
    if len(tail) < _MIN_TAIL_FRAMES:
        return None
    tail_ms = float(len(tail) * hop * 1000.0 / sr)  # full post-peak span
    # fit only down to 40 dB below peak (inclusive) — fit the decay, not
    # the noise/quantization floor it lands on
    below = np.nonzero(tail <= tail[0] - _FIT_RANGE_DB)[0]
    fit = tail
    if len(below) and below[0] + 1 >= _MIN_TAIL_FRAMES:
        fit = tail[: below[0] + 1]
    t = np.arange(len(fit), dtype=np.float64) * (hop / sr)
    tm, em = t.mean(), fit.mean()
    slope = float(((t - tm) * (fit - em)).sum() / ((t - tm) ** 2).sum())
    rt60 = 60000.0 / -slope if slope < _NO_DECAY_SLOPE_DB_S else 0.0
    return slope, float(rt60), tail_ms


def reverb_stats(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → one decay row per clip
    (``rev_ok=false`` containment row when the line cannot be fit)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in REVERB_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                sr = sr_meas or audio.declared_sr(sr_decl)
                res = clip_reverb(samples, sr)
                if res is None:
                    row = (cid, False, 0.0, 0.0, 0.0)
                else:
                    row = (cid, True, *res)
                for k, v in zip(out, row):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "rev_ok": pd.Series(out["rev_ok"], dtype=bool),
                    "decay_db_s": pd.Series(out["decay_db_s"], dtype=np.float64),
                    "rt60_ms": pd.Series(out["rt60_ms"], dtype=np.float64),
                    "tail_ms": pd.Series(out["tail_ms"], dtype=np.float64),
                }
            )

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        _extract, REVERB_SCHEMA
    )
