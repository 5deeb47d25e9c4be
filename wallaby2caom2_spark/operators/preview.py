"""Preview-artifact stage (S11): decoded PCM → thumbnail PNG column.

Reference analog: ``wallaby2caom2/preview_augmentation.py:77-97`` (render
preview, attach ``<file_id>_prev_256.png`` artifact) +
``wallaby2caom2/storage_name.py:129-131`` (thumb naming). One Arrow-batched
``mapInPandas`` crossing: payload bytes come in, a small derived PNG binary
goes out — input bytes die inside the worker, so the stage output (~1-3 KB
thumbs) is what downstream sees/shuffles, never the ~50 KB clips.

Two flavors share one worker factory: the waveform thumbnail (amplitude
envelope) and the log-magnitude spectrogram (what an audio-curation UI
actually inspects for hum/tones/dropouts). Both decode identically; only
the render function, output column names, and naming suffix differ — kept
in one loop so a decode-path fix can never apply to one flavor only.

At 100 TB this is the correct shape for any decode→derive→store media step:
narrow over scan splits, no shuffle, output written alongside results (the
thumbnail is a column, not a side-channel file sink).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.preview import (
    SPEC_H,
    SPEC_W,
    THUMB_H,
    THUMB_W,
    spectrogram_thumbnail,
    waveform_thumbnail,
)


def _preview_schema(prefix: str, ok_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField(f"{prefix}_png", T.BinaryType()),
            T.StructField(f"{prefix}_w", T.IntegerType()),
            T.StructField(f"{prefix}_h", T.IntegerType()),
            T.StructField(ok_col, T.BooleanType()),
        ]
    )


def _make_preview_worker(
    thumbnail_fn: Callable[[np.ndarray | None], bytes | None],
    prefix: str,
    ok_col: str,
    width: int,
    height: int,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """ONE decode loop for every preview flavor: decode each payload, render
    with ``thumbnail_fn``, emit (clip_id, <prefix>_png/w/h, <ok_col>)."""

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import audio

        for pdf in batches:
            ids, pngs, oks = [], [], []
            codecs = pdf["codec"].to_numpy()
            for i, raw in enumerate(pdf["bytes"].to_numpy()):
                samples, _sr = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codecs[i]
                )
                png = thumbnail_fn(samples)
                ids.append(pdf["clip_id"].iloc[i])
                pngs.append(png)
                oks.append(png is not None)
            yield pd.DataFrame(
                {
                    "clip_id": ids,
                    f"{prefix}_png": pngs,
                    f"{prefix}_w": width,
                    f"{prefix}_h": height,
                    ok_col: oks,
                }
            )

    return worker


PREVIEW_SCHEMA = _preview_schema("thumb", "prev_ok")
SPECTROGRAM_SCHEMA = _preview_schema("sgram", "sgram_ok")

make_previews = _make_preview_worker(
    waveform_thumbnail, "thumb", "prev_ok", THUMB_W, THUMB_H
)
make_spectrograms = _make_preview_worker(
    spectrogram_thumbnail, "sgram", "sgram_ok", SPEC_W, SPEC_H
)


def with_previews(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, …) → preview rows + reference-style names:
    ``thumb_name = <clip_id>_prev_<W>.png``."""
    out = df.select("clip_id", "bytes", "codec").mapInPandas(
        make_previews, PREVIEW_SCHEMA
    )
    return out.withColumn(
        "thumb_name",
        F.concat(F.col("clip_id"), F.lit(f"_prev_{THUMB_W}.png")),
    )


def with_spectrograms(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, …) → spectrogram-preview rows +
    ``sgram_name = <clip_id>_spec_<W>.png``."""
    out = df.select("clip_id", "bytes", "codec").mapInPandas(
        make_spectrograms, SPECTROGRAM_SCHEMA
    )
    return out.withColumn(
        "sgram_name",
        F.concat(F.col("clip_id"), F.lit(f"_spec_{SPEC_W}.png")),
    )
