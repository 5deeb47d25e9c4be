"""One-decode multi-signal gate pass: fingerprint + VAD + spectral shape.

The three audio gates (content fingerprint for near-dup, energy VAD for
speech presence, spectral shape for tonal artifacts) each need the decoded
samples. Run separately they decode the corpus three times — at 100 TB that
is three full reads of the payload column for ~40 bytes/clip of output
each. This operator decodes ONCE per clip and emits every gate signal from
that single pass: the container parses once, the int16 view feeds the VAD's
exact integer energies, and one int16→float32 conversion feeds the
fingerprint and the Welch spectrum.

Numerically identical to the standalone operators (same helper functions:
``vad._clip_vad``, ``spectral._clip_spectrum``, ``audio.band_fingerprint``;
the float conversion is the same /32767 scaling ``decode_clip`` applies),
pinned by tests/test_audio_signals.py.

Spark shape: one ``mapInPandas`` projection on the scan, payload dies in
the worker, ~60 bytes/clip out, no shuffle. Undecodable / rateless clips
emit ``sig_ok=false`` containment rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio
from .spectral import _clip_spectrum
from .vad import _clip_vad

SIGNALS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("sig_ok", T.BooleanType()),
        T.StructField("fp_ok", T.BooleanType()),
        T.StructField("fp", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_speech_frames", T.IntegerType()),
        T.StructField("speech_ratio", T.DoubleType()),
        T.StructField("n_speech_runs", T.IntegerType()),
        T.StructField("snr_db", T.DoubleType()),
        T.StructField("spec_ok", T.BooleanType()),
        T.StructField("flatness", T.DoubleType()),
        T.StructField("centroid_hz", T.DoubleType()),
        T.StructField("peak_share", T.DoubleType()),
    ]
)


def audio_signals(
    df: DataFrame,
    frame_ms: int = 20,
    hop_ms: int = 10,
    gate_db: float = 10.0,
) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → every gate signal, one decode."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            fp_ok = np.zeros(n, dtype=bool)
            fp = np.zeros(n, dtype=np.int64)
            n_fr = np.zeros(n, dtype=np.int32)
            n_sp = np.zeros(n, dtype=np.int32)
            runs = np.zeros(n, dtype=np.int32)
            snr = np.zeros(n, dtype=np.float64)
            sp_ok = np.zeros(n, dtype=bool)
            flat = np.zeros(n, dtype=np.float64)
            cent = np.zeros(n, dtype=np.float64)
            peak = np.zeros(n, dtype=np.float64)
            for i, (raw, codec, sr_decl) in enumerate(
                zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"])
            ):
                # pass the Arrow buffer through as-is: decode_clip_i16
                # views it zero-copy (a bytes() wrap here would memcpy the
                # full payload — the exact traffic this fused pass exists
                # to avoid)
                x16, sr_meas = audio.decode_clip_i16(raw, codec)
                if x16 is None or len(x16) == 0:
                    continue
                sr = sr_meas or audio.declared_sr(sr_decl)
                if sr <= 0:
                    continue
                ok[i] = True
                n_fr[i], n_sp[i], runs[i], snr[i] = _clip_vad(
                    x16, sr, frame_ms, hop_ms, gate_db
                )
                # the one int16→float conversion of the pass — the same
                # _FULL_SCALE scaling decode_clip applies, so fp/spectrum
                # match the standalone operators bit-for-bit
                xf = x16.astype(np.float32) / audio._FULL_SCALE
                fp_ok[i], fp[i] = audio.band_fingerprint(xf, sr)
                res = _clip_spectrum(xf, sr)
                if res is not None:
                    sp_ok[i] = True
                    flat[i], cent[i], peak[i] = res
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "sig_ok": ok,
                    "fp_ok": fp_ok,
                    "fp": fp,
                    "n_frames": n_fr,
                    "n_speech_frames": n_sp,
                    "speech_ratio": np.round(
                        np.divide(
                            n_sp,
                            n_fr,
                            out=np.zeros(n, dtype=np.float64),
                            where=n_fr > 0,
                        )
                        + 1e-12,
                        6,
                    ),
                    "n_speech_runs": runs,
                    "snr_db": np.round(snr + 1e-9, 3),
                    "spec_ok": sp_ok,
                    "flatness": np.round(flat + 1e-12, 6),
                    "centroid_hz": np.round(cent + 1e-9, 2),
                    "peak_share": np.round(peak + 1e-12, 6),
                }
            )

    cols = ["clip_id", "bytes", "codec", "sr_hz"]
    return df.select(*cols).mapInPandas(_run, SIGNALS_SCHEMA)
