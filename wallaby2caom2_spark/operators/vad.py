"""Energy-based voice-activity detection (VAD) — per-clip speech stats.

ASR training corpora gate on "does this clip actually contain speech-like
signal, and how much": clips that are mostly silence or steady noise waste
tokens and bias duration statistics.  This operator computes, per clip, the
frame-level activity profile a webdataset-style audio pipeline uses for
that gate: speech ratio, contiguous speech-run count, and an SNR estimate
(active vs inactive frame energy).

Detection is adaptive-threshold energy VAD (deterministic, library-free —
swap in a model-based VAD by replacing ``_clip_vad`` only): 20 ms frames at
10 ms hop, frame energy from the zero-copy int16 view (exact int64 sums —
no float drift), noise floor = p10 of frame energies, a frame is active
when its energy clears noise_floor × 10^(gate_db/10) AND an absolute
silence floor.  A clip with NO dynamics (all frames within the gate of the
floor — steady tone, hum, silence) scores speech_ratio 0: energy VAD
detects modulation, which is the property training filters care about.

Spark shape: one ``mapInPandas`` projection on the scan — the payload dies
in the worker; out go ~40 bytes/clip of stats.  No shuffle.  Undecodable
clips emit a ``vad_ok = false`` row (lineage keeps every input clip; the
cascade has already routed them to ``decode_failed``).

Reference analog: the per-file metadata "sanity visitor" pattern
(``wallaby2caom2/main_app.py:153-170``) — derive per-item quality signals
from the payload, never fail the batch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio
from .features import _frame_matrix

VAD_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("vad_ok", T.BooleanType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_speech_frames", T.IntegerType()),
        T.StructField("speech_ratio", T.DoubleType()),
        T.StructField("n_speech_runs", T.IntegerType()),
        T.StructField("snr_db", T.DoubleType()),
    ]
)

# int16-domain absolute silence floor: rms 1e-4 of full scale (matches the
# fingerprint's silence gate in functions/audio.py), squared into energy
_ABS_ENERGY_FLOOR = (1e-4 * 32768.0) ** 2


def frame_activity(
    x: np.ndarray, sr: int, frame_ms: int, hop_ms: int, gate_db: float
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """int16 samples → (frame_energies, active_mask, win, hop).

    THE speech-activity definition, shared by the VAD stats operator and
    the silence trimmer (operators/trim.py) so 'speech' always means the
    same thing: exact integer frame energies (int64 sums of squares, one
    float64 divide), p10 adaptive noise floor, gate = max(noise x
    10^(gate_db/10), absolute silence floor). Recalibrate HERE and every
    consumer follows.
    """
    win = max(1, int(round(sr * frame_ms / 1000.0)))
    hop = max(1, int(round(sr * hop_ms / 1000.0)))
    frames = _frame_matrix(x, win, hop)
    if frames.shape[0] == 0:
        return (
            np.empty(0, dtype=np.float64),
            np.empty(0, dtype=bool),
            win,
            hop,
        )
    e = frames.astype(np.int64)
    e = np.einsum("ij,ij->i", e, e).astype(np.float64) / win
    noise = float(np.percentile(e, 10.0))
    thr = max(noise * (10.0 ** (gate_db / 10.0)), _ABS_ENERGY_FLOOR)
    return e, e > thr, win, hop


def _clip_vad(
    x: np.ndarray, sr: int, frame_ms: int, hop_ms: int, gate_db: float
) -> tuple[int, int, int, float]:
    """int16 samples → (n_frames, n_speech, n_runs, snr_db)."""
    e, speech, _, _ = frame_activity(x, sr, frame_ms, hop_ms, gate_db)
    n_frames = len(e)
    if n_frames == 0:
        return 0, 0, 0, 0.0
    n_speech = int(speech.sum())
    if n_speech == 0:
        return n_frames, 0, 0, 0.0
    n_runs = int(speech[0]) + int(np.count_nonzero(speech[1:] & ~speech[:-1]))
    inactive = e[~speech]
    if inactive.size == 0 or float(inactive.mean()) <= 0.0:
        snr_db = 99.0
    else:
        snr_db = float(
            min(99.0, 10.0 * np.log10(e[speech].mean() / inactive.mean()))
        )
    return n_frames, n_speech, n_runs, snr_db


def vad_stats(
    df: DataFrame,
    frame_ms: int = 20,
    hop_ms: int = 10,
    gate_db: float = 10.0,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → per-clip VAD stats (VAD_SCHEMA).

    ``passthrough`` names extra input columns copied verbatim onto the
    output (appended after VAD_SCHEMA's fields).  Compute derived values
    (e.g. ``F.length("transcript")``) BEFORE this operator and pass the
    slim column through — that keeps compositions like the speaking-rate
    gate at ZERO shuffles instead of re-joining two derivations of the
    same scan on clip_id.
    """
    schema = T.StructType(
        list(VAD_SCHEMA.fields)
        + [df.schema[name] for name in passthrough]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            n_fr = np.zeros(n, dtype=np.int32)
            n_sp = np.zeros(n, dtype=np.int32)
            runs = np.zeros(n, dtype=np.int32)
            snr = np.zeros(n, dtype=np.float64)
            for i, (raw, codec, sr_decl) in enumerate(
                zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"])
            ):
                samples, sr_meas = audio.decode_clip_i16(raw, codec)
                if samples is None or len(samples) == 0:
                    continue
                sr = sr_meas or audio.declared_sr(sr_decl)
                if sr <= 0:
                    continue
                ok[i] = True
                n_fr[i], n_sp[i], runs[i], snr[i] = _clip_vad(
                    samples, sr, frame_ms, hop_ms, gate_db
                )
            ratio = np.divide(
                n_sp, n_fr, out=np.zeros(n, dtype=np.float64), where=n_fr > 0
            )
            out = {
                "clip_id": pdf["clip_id"],
                "vad_ok": ok,
                "n_frames": n_fr,
                "n_speech_frames": n_sp,
                "speech_ratio": np.round(ratio + 1e-12, 6),
                "n_speech_runs": runs,
                "snr_db": np.round(snr + 1e-9, 3),
            }
            for name in passthrough:
                out[name] = pdf[name]
            yield pd.DataFrame(out)

    cols = ["clip_id", "bytes", "codec", "sr_hz", *passthrough]
    return df.select(*cols).mapInPandas(_run, schema)
