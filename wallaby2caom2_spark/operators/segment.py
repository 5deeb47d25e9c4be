"""Audio segmentation: one clip row → N fixed-window segment rows.

The one→many (flatMap/UDTF-shaped) operator a training pipeline runs after
quality filtering: normalize every kept clip to a common sample rate, then
window it into fixed-length training segments. Implemented with
``mapInPandas`` — the Spark-native way to emit a variable number of output
rows per input row from an Arrow batch.

Scale shape: the ~50 KB ``bytes`` payload is consumed inside the worker and
replaced by per-segment payloads (bounded by ``window_ms``); no shuffle is
introduced — segmentation is embarrassingly parallel over input partitions,
and downstream ops see a table whose row count grew ~dur/window per clip but
whose per-row size SHRANK, which is what keeps executor memory flat.

Reference analog: the artifact→parts explosion of the observation tree
(``wallaby2caom2/main_app.py:208-231``) — one input record fanning out into
typed sub-records keyed (clip_id, seg_idx).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("seg_idx", T.IntegerType()),
        T.StructField("seg_start_ms", T.IntegerType()),
        T.StructField("seg_dur_ms", T.IntegerType()),
        T.StructField("seg_bytes", T.BinaryType()),
        T.StructField("seg_rms", T.DoubleType()),
    ]
)


def segment_clips(
    df: DataFrame,
    window_ms: int = 250,
    sr_out: int = 16000,
    keep_partial: bool = True,
) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → one row per ``window_ms`` segment,
    resampled to ``sr_out`` and re-encoded as raw ``pcm_s16le``.

    Undecodable clips produce zero segments (error containment — the
    quality-filter cascade has already routed them to ``decode_failed``;
    this stage never fails a batch). ``keep_partial=False`` drops the
    trailing sub-window segment, the usual choice for fixed-shape training
    batches.
    """
    win_samples = int(round(window_ms * sr_out / 1000.0))

    def _segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "clip_id": [],
                "seg_idx": [],
                "seg_start_ms": [],
                "seg_dur_ms": [],
                "seg_bytes": [],
                "seg_rms": [],
            }
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                if samples is None or len(samples) == 0:
                    continue
                sr = sr_meas or audio.declared_sr(sr_decl)
                if sr <= 0:
                    continue
                samples = audio.resample_linear(samples, sr, sr_out)
                n_full, tail = divmod(len(samples), win_samples)
                n_segs = n_full + (1 if keep_partial and tail else 0)
                for i in range(n_segs):
                    seg = samples[i * win_samples : (i + 1) * win_samples]
                    out["clip_id"].append(cid)
                    out["seg_idx"].append(i)
                    out["seg_start_ms"].append(i * window_ms)
                    out["seg_dur_ms"].append(
                        int(round(len(seg) * 1000.0 / sr_out))
                    )
                    out["seg_bytes"].append(audio.encode_pcm_s16le(seg))
                    out["seg_rms"].append(
                        float(
                            np.sqrt(
                                np.mean(np.square(seg, dtype=np.float64))
                            )
                        )
                    )
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "seg_idx": pd.Series(out["seg_idx"], dtype=np.int32),
                    "seg_start_ms": pd.Series(
                        out["seg_start_ms"], dtype=np.int32
                    ),
                    "seg_dur_ms": pd.Series(
                        out["seg_dur_ms"], dtype=np.int32
                    ),
                    "seg_bytes": pd.Series(out["seg_bytes"], dtype=object),
                    "seg_rms": pd.Series(out["seg_rms"], dtype=np.float64),
                }
            )

    cols = ["clip_id", "bytes", "codec", "sr_hz"]
    return df.select(*cols).mapInPandas(_segment, SEGMENT_SCHEMA)
