"""Multimodal (opaque-binary) column plumbing — mapInPandas feature extract.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, per the 100 TB training-data-pipeline design: the Spark-side
plumbing (schema, Arrow batch shape, iterator lifecycle, partitioning) is
real and tested. PNG geometry is REAL (stdlib IHDR parse — the repo
hand-writes PNGs in functions/preview.py, so the format knowledge is
in-tree); only the JPEG pixel decode remains stubbed because the image
libraries are not in this container.

Reference analog: the preview/thumbnail visitor (S11,
``wallaby2caom2/preview_augmentation.py:77-97``) — a per-item binary →
derived-artifact step — re-expressed as one Arrow-batched stage.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    from PIL import Image as _pil_image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("media_ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

_MAGIC_KINDS = (
    (b"RIFF", "wav"),
    (b"fLaC", "flac"),
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
)


def _sniff_kind(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    for magic, kind in _MAGIC_KINDS:
        if payload.startswith(magic):
            return kind
    return "raw"


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """JPEG STUB: real decode needs PIL/libvips (absent here) — swap this
    body for ``PIL.Image.open(io.BytesIO(payload)).size`` when wiring the
    real path. Always emits a deterministic fake geometry derived from
    payload length so the downstream plumbing (resize planning, batch
    accounting) is exercised — unconditionally, so a host where PIL merely
    happens to be importable doesn't turn every jpeg row into a task
    crash."""
    n = len(payload)
    return 16 + n % 64, 16 + (n // 64) % 64


def _png_dims(payload: bytes) -> tuple[int, int]:
    """REAL PNG geometry: IHDR width/height, big-endian uint32 at byte
    offsets 16 and 20 (8-byte signature + 4-byte chunk length + 4-byte
    ``IHDR`` tag precede them — fixed by the PNG spec, the IHDR chunk MUST
    come first). No PIL needed. Caller guarantees ``len(payload) >= 24``."""
    import struct

    return struct.unpack_from(">II", payload, 16)


def extract_media_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (clip_id, bytes) → typed media metadata rows."""
    for pdf in batches:
        out = {k: [] for k in ("clip_id", "kind", "n_bytes", "media_ok", "width", "height", "n_frames")}
        for cid, raw in zip(pdf["clip_id"], pdf["bytes"]):
            payload = bytes(raw) if raw is not None else None
            kind = _sniff_kind(payload)
            n = len(payload) if payload else 0
            # a PNG needs its full IHDR (sig + chunk header + 8 dim bytes =
            # 24) to be decodable; other kinds keep the header floor of 12
            ok = kind not in ("empty", "raw") and (
                n >= 24 if kind == "png" else n > 12
            )
            w = h = frames = 0
            if ok:
                if kind == "png":
                    w, h = _png_dims(payload)
                    frames = 1
                elif kind == "jpeg":
                    w, h = _decode_image_stub(payload)
                    frames = 1
                else:  # audio container: frame-sample plan = 1 frame / 100ms
                    frames = max(1, n // 3200)
            out["clip_id"].append(cid)
            out["kind"].append(kind)
            out["n_bytes"].append(n)
            out["media_ok"].append(ok)
            out["width"].append(w)
            out["height"].append(h)
            out["n_frames"].append(frames)
        yield pd.DataFrame(out)


def with_media_meta(df: DataFrame) -> DataFrame:
    """Project (clip_id, bytes) → media metadata. Column pruning: selecting
    only the two input columns keeps the scan narrow; the binary column
    never survives past this stage."""
    return df.select("clip_id", "bytes").mapInPandas(
        extract_media_meta, MEDIA_META_SCHEMA
    )


def media_kind_summary(df: DataFrame) -> DataFrame:
    return with_media_meta(df).groupBy("kind").agg(
        F.count("*").alias("n_clips"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum(F.when(F.col("media_ok"), 1).otherwise(0)).cast("bigint").alias("n_ok"),
        F.sum("n_frames").cast("bigint").alias("total_frames"),
        # geometry sums pin the IHDR parse (png) and the stub arithmetic
        # (jpeg) under the DuckDB oracle; 0 for non-image kinds
        F.sum("width").cast("bigint").alias("sum_width"),
        F.sum("height").cast("bigint").alias("sum_height"),
    )
