"""Loudness normalization — the per-clip gain stage a speech-training
pipeline runs between quality filtering and segmentation, so every training
example presents a comparable signal level to the model.

Semantics: scale each clip to a target RMS level (dBFS), with a hard peak
ceiling — the gain is ``min(target_rms / rms, peak_ceiling / peak)`` so a
high-crest clip is brought as close to the target as it can get WITHOUT
clipping (gain-limited, never distorted). Output is raw ``pcm_s16le`` at the
measured sample rate, like the segmenter's output contract.

Spark shape (the 100 TB part): one ``mapInPandas`` projection directly on
the scan — the input payload is decoded and immediately replaced by the
normalized payload inside the worker, so per-row memory is bounded and no
shuffle is introduced; the stage composes with ``segment_clips`` in the same
narrow chain. Undecodable/silent clips yield ``norm_ok = false`` with a null
payload (error containment, same contract as decode: a bad row NEVER fails
the batch — reference analog: the per-file parser fallback gate,
``wallaby2caom2/main_app.py:117-126``).

All arithmetic is vectorized numpy on Arrow batches; no per-row Python
beyond the unavoidable bytes-object boundary (one ``zip`` over the batch,
like every binary stage in this repo).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio

NORMALIZE_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("norm_ok", T.BooleanType()),
        T.StructField("norm_bytes", T.BinaryType()),
        T.StructField("sr_out_hz", T.IntegerType()),
        T.StructField("gain_db", T.DoubleType()),
        T.StructField("src_rms_dbfs", T.DoubleType()),
        T.StructField("out_rms_dbfs", T.DoubleType()),
        T.StructField("peak_limited", T.BooleanType()),
    ]
)

_SILENCE_RMS = 1e-5  # below this the clip has no signal worth scaling


def _dbfs(x: float) -> float:
    return 20.0 * float(np.log10(max(x, 1e-12)))


def normalize_clips(
    df: DataFrame,
    target_rms_dbfs: float = -20.0,
    peak_ceiling_dbfs: float = -1.0,
) -> DataFrame:
    """(clip_id, bytes, codec) → RMS-normalized ``pcm_s16le`` payloads with
    the applied gain and before/after levels as typed columns."""
    target_rms = 10.0 ** (target_rms_dbfs / 20.0)
    peak_ceiling = 10.0 ** (peak_ceiling_dbfs / 20.0)

    def _normalize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in NORMALIZE_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                # headerless raw pcm carries no rate — fall back to the
                # declared column, same contract as segment_clips
                sr = sr_meas or audio.declared_sr(sr_decl)
                row = {
                    "clip_id": cid,
                    "norm_ok": False,
                    "norm_bytes": None,
                    "sr_out_hz": 0,
                    "gain_db": 0.0,
                    "src_rms_dbfs": -120.0,
                    "out_rms_dbfs": -120.0,
                    "peak_limited": False,
                }
                if samples is not None and len(samples) > 0 and sr > 0:
                    rms = float(np.sqrt(np.mean(np.square(samples, dtype=np.float64))))
                    peak = float(np.max(np.abs(samples)))
                    if rms >= _SILENCE_RMS and peak > 0.0:
                        gain = target_rms / rms
                        limited = gain * peak > peak_ceiling
                        if limited:
                            gain = peak_ceiling / peak
                        scaled = np.clip(
                            samples.astype(np.float64) * gain, -1.0, 1.0
                        ).astype(np.float32)
                        out_rms = float(
                            np.sqrt(np.mean(np.square(scaled, dtype=np.float64)))
                        )
                        row.update(
                            norm_ok=True,
                            norm_bytes=audio.encode_pcm_s16le(scaled),
                            sr_out_hz=int(sr),
                            gain_db=_dbfs(gain),
                            src_rms_dbfs=_dbfs(rms),
                            out_rms_dbfs=_dbfs(out_rms),
                            peak_limited=bool(limited),
                        )
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "norm_ok": pd.Series(out["norm_ok"], dtype=bool),
                    "norm_bytes": pd.Series(out["norm_bytes"], dtype=object),
                    "sr_out_hz": pd.Series(out["sr_out_hz"], dtype=np.int32),
                    "gain_db": pd.Series(out["gain_db"], dtype=np.float64),
                    "src_rms_dbfs": pd.Series(
                        out["src_rms_dbfs"], dtype=np.float64
                    ),
                    "out_rms_dbfs": pd.Series(
                        out["out_rms_dbfs"], dtype=np.float64
                    ),
                    "peak_limited": pd.Series(out["peak_limited"], dtype=bool),
                }
            )

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        _normalize, NORMALIZE_SCHEMA
    )
