"""Canonical-rate conversion — normalize a heterogeneous corpus to ONE
sample rate before windowed training consumption.

Web-harvested audio arrives at every rate a device ever shipped (8 k
telephony, 22.05 k podcast rips, 44.1/48 k consumer capture). Every
downstream tensor consumer (segmentation, filterbank features, model
input pipelines) assumes one canonical rate; converting once at curation
time beats converting per-epoch at training time by the corpus/epoch
ratio. This operator is that converting pass, with the path split a real
pipeline needs:

* ``passthrough``      — already at the target rate: payload re-emitted
  byte-exact (int16 view → bytes, no float round trip, lossless).
* ``upsample_linear``  — below the target: linear interpolation (an
  upsample cannot alias; cheap is correct).
* ``downsample_fir``   — above the target: Hamming-windowed-sinc low-pass
  at 0.45x the OUTPUT rate, then interpolation
  (functions/audio.resample_bandlimited). Without the filter, content
  above the output Nyquist folds back in-band and poisons every spectral
  feature computed afterwards.

Undecodable / rateless clips emit ``rs_ok=false`` containment rows (same
contract as decode/trim — never silently delete what cannot be measured).

Output contract matches the segmenter/normalizer: raw ``pcm_s16le`` at
``sr_out_hz`` plus before/after geometry, so the saved/added byte fraction
is observable per method class.

Spark shape: one ``mapInPandas`` projection on the scan — payload in,
(possibly re-rated) payload out inside the worker, no shuffle; the FIR is
one ``np.convolve`` per clip on float64, everything else is vectorized
numpy.

Reference analog: the preview/thumbnail derived-artifact visitor
(``wallaby2caom2/preview_augmentation.py:77-97``) — binary in, derived
typed binary out, one Arrow-batched stage.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio

RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("rs_ok", T.BooleanType()),
        T.StructField("rs_method", T.StringType()),
        T.StructField("rs_bytes", T.BinaryType()),
        T.StructField("sr_in_hz", T.IntegerType()),
        T.StructField("sr_out_hz", T.IntegerType()),
        T.StructField("dur_ms_in", T.IntegerType()),
        T.StructField("dur_ms_out", T.IntegerType()),
        T.StructField("rs_rms", T.DoubleType()),
    ]
)

TARGET_SR = 16000


def resample_clip(
    raw, codec, sr_decl, sr_out: int = TARGET_SR
) -> dict:
    """One clip → the resample output row (dict keyed by RESAMPLE_SCHEMA
    names, ``rs_bytes`` as bytes|None). Shared verbatim by the Spark UDF
    below and the fixture replay (fixtures.py) — single source of truth,
    bit-identical oracle by construction."""
    row = dict(
        rs_ok=False, rs_method="undecodable", rs_bytes=None,
        sr_in_hz=0, sr_out_hz=0, dur_ms_in=0, dur_ms_out=0, rs_rms=0.0,
    )
    x16, sr_meas = audio.decode_clip_i16(raw, codec)
    if x16 is None or len(x16) == 0:
        return row
    sr = sr_meas or audio.declared_sr(sr_decl)
    if sr <= 0:
        row["rs_method"] = "rateless"
        return row
    row["sr_in_hz"] = int(sr)
    row["dur_ms_in"] = int(round(len(x16) * 1000.0 / sr))
    if sr == sr_out:
        # lossless: int16 stays int16, no float round trip
        q = np.asarray(x16, dtype="<i2")
        y = q.astype(np.float64) / audio._FULL_SCALE
        row.update(rs_method="passthrough", rs_bytes=q.tobytes())
    else:
        xf = (x16.astype(np.float64) / audio._FULL_SCALE).astype(np.float32)
        if sr < sr_out:
            yf = audio.resample_linear(xf, sr, sr_out)
            method = "upsample_linear"
        else:
            yf = audio.resample_bandlimited(xf, sr, sr_out)
            method = "downsample_fir"
        if len(yf) == 0:
            return row
        q = np.clip(
            np.rint(yf.astype(np.float64) * audio._FULL_SCALE), -32768, 32767
        ).astype("<i2")
        y = q.astype(np.float64) / audio._FULL_SCALE
        row.update(rs_method=method, rs_bytes=q.tobytes())
    row.update(
        rs_ok=True,
        sr_out_hz=int(sr_out),
        dur_ms_out=int(round((len(row["rs_bytes"]) // 2) * 1000.0 / sr_out)),
        # RMS of the QUANTIZED output — what a reader of rs_bytes measures
        rs_rms=float(np.sqrt(np.mean(np.square(y)))) if len(y) else 0.0,
    )
    return row


def resample_clips(df: DataFrame, sr_out: int = TARGET_SR) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → canonical-rate pcm payloads."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                dict(
                    clip_id=cid,
                    **resample_clip(
                        bytes(raw) if raw is not None else None,
                        codec,
                        sr_decl,
                        sr_out,
                    ),
                )
                for cid, raw, codec, sr_decl in zip(
                    pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
                )
            ]
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(
                        [r["clip_id"] for r in rows], dtype=object
                    ),
                    "rs_ok": pd.Series([r["rs_ok"] for r in rows], dtype=bool),
                    "rs_method": pd.Series(
                        [r["rs_method"] for r in rows], dtype=object
                    ),
                    "rs_bytes": pd.Series(
                        [r["rs_bytes"] for r in rows], dtype=object
                    ),
                    "sr_in_hz": pd.Series(
                        [r["sr_in_hz"] for r in rows], dtype=np.int32
                    ),
                    "sr_out_hz": pd.Series(
                        [r["sr_out_hz"] for r in rows], dtype=np.int32
                    ),
                    "dur_ms_in": pd.Series(
                        [r["dur_ms_in"] for r in rows], dtype=np.int32
                    ),
                    "dur_ms_out": pd.Series(
                        [r["dur_ms_out"] for r in rows], dtype=np.int32
                    ),
                    "rs_rms": pd.Series(
                        [r["rs_rms"] for r in rows], dtype=np.float64
                    ),
                }
            )

    cols = ["clip_id", "bytes", "codec", "sr_hz"]
    return df.select(*cols).mapInPandas(_run, RESAMPLE_SCHEMA)
