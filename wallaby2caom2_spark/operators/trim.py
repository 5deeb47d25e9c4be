"""Silence trimming — cut leading/trailing non-speech from each clip.

The preprocessing step between quality filtering and segmentation that
directly shrinks the corpus: recordings routinely carry 0.5-3 s of room
tone before and after the utterance, and at 10^12 clips that dead air is
petabytes of storage, decode time, and training-window pollution.

Detection reuses the energy VAD's frame profile (operators/vad.py — same
frames, same adaptive threshold, so "speech" means the same thing in both
operators): the trimmed clip spans the FIRST through LAST active frame,
padded by ``pad_ms`` of context on each side (never past the clip edges).
Interior pauses are preserved — this is an endpoint trim, not a pause
compactor.

Output contract follows the segmenter/normalizer: raw ``pcm_s16le`` at the
measured rate, plus before/after durations so the saved fraction is
observable. Clips with NO detected speech emit ``trim_ok=false`` and a
NULL payload (the funnel's no-speech gate owns that decision — this
operator never silently deletes content it cannot localize).

Spark shape: one ``mapInPandas`` projection on the scan, payload in →
(usually smaller) payload out inside the worker, no shuffle; slicing is a
numpy view so the only allocation is the output buffer.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio
from .vad import frame_activity

TRIM_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("trim_ok", T.BooleanType()),
        T.StructField("trim_bytes", T.BinaryType()),
        T.StructField("sr_out_hz", T.IntegerType()),
        T.StructField("dur_ms_in", T.IntegerType()),
        T.StructField("dur_ms_out", T.IntegerType()),
    ]
)


def _speech_span(
    x: np.ndarray, sr: int, frame_ms: int, hop_ms: int, gate_db: float
) -> tuple[int, int] | None:
    """int16 samples → (first_sample, last_sample_exclusive) of the active
    region, or None when no frame clears the VAD gate. Activity comes from
    the SHARED vad.frame_activity definition — the trimmer and the VAD
    stats operator can never disagree about what counts as speech."""
    _, mask, win, hop = frame_activity(x, sr, frame_ms, hop_ms, gate_db)
    active = np.flatnonzero(mask)
    if active.size == 0:
        return None
    first = int(active[0]) * hop
    last = int(active[-1]) * hop + win
    return first, min(last, len(x))


def trim_silence(
    df: DataFrame,
    frame_ms: int = 20,
    hop_ms: int = 10,
    gate_db: float = 10.0,
    pad_ms: int = 100,
) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → endpoint-trimmed pcm payloads."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {k.name: [None] * n for k in TRIM_SCHEMA}
            for i, (cid, raw, codec, sr_decl) in enumerate(
                zip(pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"])
            ):
                out["clip_id"][i] = cid
                out["trim_ok"][i] = False
                out["sr_out_hz"][i] = 0
                out["dur_ms_in"][i] = 0
                out["dur_ms_out"][i] = 0
                x, sr_meas = audio.decode_clip_i16(raw, codec)
                if x is None or len(x) == 0:
                    continue
                sr = sr_meas or audio.declared_sr(sr_decl)
                if sr <= 0:
                    continue
                out["dur_ms_in"][i] = int(round(len(x) * 1000.0 / sr))
                span = _speech_span(x, sr, frame_ms, hop_ms, gate_db)
                if span is None:
                    continue
                pad = int(round(sr * pad_ms / 1000.0))
                a = max(0, span[0] - pad)
                b = min(len(x), span[1] + pad)
                seg = np.asarray(x[a:b], dtype="<i2")
                out["trim_ok"][i] = True
                # asarray is a no-op on the (already <i2, contiguous) slice
                # view; tobytes() is the single output-buffer copy
                out["trim_bytes"][i] = seg.tobytes()
                out["sr_out_hz"][i] = int(sr)
                out["dur_ms_out"][i] = int(round(len(seg) * 1000.0 / sr))
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "trim_ok": pd.Series(out["trim_ok"], dtype=bool),
                    "trim_bytes": pd.Series(out["trim_bytes"], dtype=object),
                    "sr_out_hz": pd.Series(out["sr_out_hz"], dtype=np.int32),
                    "dur_ms_in": pd.Series(out["dur_ms_in"], dtype=np.int32),
                    "dur_ms_out": pd.Series(out["dur_ms_out"], dtype=np.int32),
                }
            )

    cols = ["clip_id", "bytes", "codec", "sr_hz"]
    return df.select(*cols).mapInPandas(_run, TRIM_SCHEMA)
