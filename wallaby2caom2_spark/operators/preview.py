"""Preview-artifact stage (S11): decoded PCM → waveform-thumbnail PNG column.

Reference analog: ``wallaby2caom2/preview_augmentation.py:77-97`` (render
preview, attach ``<file_id>_prev_256.png`` artifact) +
``wallaby2caom2/storage_name.py:129-131`` (thumb naming). One Arrow-batched
``mapInPandas`` crossing: payload bytes come in, a small derived PNG binary
goes out — input bytes die inside the worker, so the stage output (~1-3 KB
thumbs) is what downstream sees/shuffles, never the ~50 KB clips.

At 100 TB this is the correct shape for any decode→derive→store media step:
narrow over scan splits, no shuffle, output written alongside results (the
thumbnail is a column, not a side-channel file sink).
"""

from __future__ import annotations

from typing import Iterator

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

PREVIEW_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("thumb_png", T.BinaryType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("prev_ok", T.BooleanType()),
    ]
)


def make_previews(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..functions import audio

    for pdf in batches:
        ids, pngs, oks = [], [], []
        codecs = pdf["codec"].to_numpy()
        for i, raw in enumerate(pdf["bytes"].to_numpy()):
            samples, _sr = audio.decode_clip(
                bytes(raw) if raw is not None else None, codecs[i]
            )
            png = waveform_thumbnail(samples)
            ids.append(pdf["clip_id"].iloc[i])
            pngs.append(png)
            oks.append(png is not None)
        yield pd.DataFrame(
            {
                "clip_id": ids,
                "thumb_png": pngs,
                "thumb_w": THUMB_W,
                "thumb_h": THUMB_H,
                "prev_ok": oks,
            }
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


SPECTROGRAM_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("sgram_png", T.BinaryType()),
        T.StructField("sgram_w", T.IntegerType()),
        T.StructField("sgram_h", T.IntegerType()),
        T.StructField("sgram_ok", T.BooleanType()),
    ]
)


def make_spectrograms(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Second preview flavor: decoded PCM → log-magnitude spectrogram PNG
    (functions/preview.py ``spectrogram_thumbnail``) — the thumbnail an
    audio-curation UI actually inspects for hum/tones/dropouts. Same shape
    as the waveform stage: bytes in, ~2-6 KB derived artifact out, payload
    dies in the worker."""
    from ..functions import audio

    for pdf in batches:
        ids, pngs, oks = [], [], []
        codecs = pdf["codec"].to_numpy()
        for i, raw in enumerate(pdf["bytes"].to_numpy()):
            samples, _sr = audio.decode_clip(
                bytes(raw) if raw is not None else None, codecs[i]
            )
            png = spectrogram_thumbnail(samples)
            ids.append(pdf["clip_id"].iloc[i])
            pngs.append(png)
            oks.append(png is not None)
        yield pd.DataFrame(
            {
                "clip_id": ids,
                "sgram_png": pngs,
                "sgram_w": SPEC_W,
                "sgram_h": SPEC_H,
                "sgram_ok": oks,
            }
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
