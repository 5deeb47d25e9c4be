"""Multimodal (opaque-binary) column plumbing — mapInPandas feature extract.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, per the 100 TB training-data-pipeline design: the Spark-side
plumbing (schema, Arrow batch shape, iterator lifecycle, partitioning) is
real and tested. Geometry is REAL for both image kinds, no PIL needed:
PNG via a stdlib IHDR parse (the repo hand-writes PNGs in
functions/preview.py, so the format knowledge is in-tree) and JPEG via a
stdlib SOF marker-segment walk. Pixel decode is ALSO real for both image
kinds — PNG via full zlib inflate + all-five-filters scanline
reconstruction (functions/png.py), JPEG via baseline huffman + dequant +
IDCT (functions/jpeg.py) — feeding per-image pixel statistics
(``png_pixel_stats`` / ``jpeg_pixel_stats``) the image-quality rules of a
curation pipeline read (mean luminance, dynamic range). No image library
anywhere.

Reference analog: the preview/thumbnail visitor (S11,
``wallaby2caom2/preview_augmentation.py:77-97``) — a per-item binary →
derived-artifact step — re-expressed as one Arrow-batched stage.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


# every SOFn marker that carries frame geometry (C0-CF minus DHT C4,
# JPG C8 and DAC CC, which are table/extension segments)
_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}


def _jpeg_sof(payload: bytes) -> tuple[int, int, int] | None:
    """REAL JPEG frame header, stdlib only: walk the marker segments after
    SOI until a start-of-frame (SOFn) marker and read its big-endian
    height/width and component count (offsets +5/+7/+9 past the marker:
    length(2), precision(1), height(2), width(2), ncomp(1)). Skips 0xFF
    fill bytes and standalone markers (TEM/RSTn), follows each variable
    segment via its 2-byte length. Returns (width, height, ncomp), or
    None — media_ok=false downstream — on a corrupt chain (stuffed byte
    where a marker belongs, segment length < 2, EOI/SOS before any SOF,
    or a truncated stream)."""
    import struct

    n = len(payload)
    i = 2  # past SOI
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte before a marker
            i += 1
            continue
        if marker in _SOF_MARKERS:
            if i + 10 > n:
                return None
            height, width, ncomp = struct.unpack_from(">HHB", payload, i + 5)
            return int(width), int(height), int(ncomp)
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # TEM/RSTn/SOI: bare
            i += 2
            continue
        if marker in (0x00, 0xD9, 0xDA):  # stuffed byte / EOI / SOS
            return None
        seglen = struct.unpack_from(">H", payload, i + 2)[0]
        if seglen < 2:
            return None
        i += 2 + seglen
    return None


def _jpeg_dims(payload: bytes) -> tuple[int, int] | None:
    """(width, height) view of :func:`_jpeg_sof` — the geometry consumers
    (media meta, oracles) don't care about the component count."""
    sof = _jpeg_sof(payload)
    return None if sof is None else (sof[0], sof[1])


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
            # 24) to be decodable; a JPEG is ok only if the SOF walk
            # recovers geometry; audio keeps the header floor of 12
            w = h = frames = 0
            if kind == "png":
                ok = n >= 24
                if ok:
                    w, h = _png_dims(payload)
                    frames = 1
            elif kind == "jpeg":
                dims = _jpeg_dims(payload)
                ok = dims is not None
                if ok:
                    w, h = dims
                    frames = 1
            elif kind in ("wav", "flac"):
                ok = n > 12
                if ok:  # audio container: frame-sample plan = 1 frame/100ms
                    frames = max(1, n // 3200)
            else:
                ok = False
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


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_vals", T.LongType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
    ]
)


def _append_pixel_row(out: dict, cid, w: int, h: int, ch: int, img) -> None:
    """Shared stats-row emitter for both pixel workers: geometry/channels
    are HEADER facts (available even when decode fails); the pixel stats
    are decode facts (NULL unless the full decode succeeded). One copy so
    the contract — including what NULL means — cannot diverge per format."""
    out["clip_id"].append(cid)
    out["decode_ok"].append(img is not None)
    out["width"].append(int(w))
    out["height"].append(int(h))
    out["channels"].append(int(ch))
    if img is None:
        out["n_vals"].append(None)
        out["px_sum"].append(None)
        out["px_min"].append(None)
        out["px_max"].append(None)
    else:
        flat = img.reshape(-1).astype(np.int64)
        out["n_vals"].append(int(flat.size))
        out["px_sum"].append(int(flat.sum()))
        out["px_min"].append(int(flat.min()))
        out["px_max"].append(int(flat.max()))


def _with_px_mean(stats: DataFrame) -> DataFrame:
    """Derive the mean in codegen from the two exact integers the worker
    returns — the Python boundary carries only ints, so the float rounding
    convention lives in ONE (JVM) place, mirrored by both DuckDB oracles."""
    return stats.withColumn(
        "px_mean",
        F.round(F.col("px_sum") / F.col("n_vals") + F.lit(1e-9), 6),
    )


def extract_png_pixel_stats(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (clip_id, bytes) → REAL per-image pixel stats
    for PNG payloads (non-PNG rows are dropped in the worker — the sniff
    is cheap and keeps the operator composable over mixed media tables).
    A payload whose IHDR parses but whose stream is corrupt/truncated
    yields decode_ok=false with its declared geometry and NULL pixel
    stats — geometry is header fact, pixels are not."""
    from ..functions.png import _CTYPE_CHANNELS, decode_png

    for pdf in batches:
        out = {k.name: [] for k in PIXEL_STATS_SCHEMA.fields}
        for cid, raw in zip(pdf["clip_id"], pdf["bytes"]):
            payload = bytes(raw) if raw is not None else None
            if _sniff_kind(payload) != "png":
                continue
            if len(payload) < 26:  # signature but no full IHDR: no header
                _append_pixel_row(out, cid, 0, 0, 0, None)
                continue
            w, h = _png_dims(payload)
            ch = _CTYPE_CHANNELS.get(payload[25], 0)
            _append_pixel_row(out, cid, w, h, ch, decode_png(payload))
        yield pd.DataFrame(out, columns=[f.name for f in PIXEL_STATS_SCHEMA])


def _magic_prefilter(df: DataFrame, magic: bytes) -> DataFrame:
    """Codegen prefilter on the payload's magic bytes: at 100 TB the
    dominant cost of a pixel operator is shipping payloads over the Arrow
    boundary, so rows of other kinds must be dropped JVM-side, not by the
    worker's sniff (which still runs as a second guard). Equivalent to the
    sniff for this purpose: a payload shorter than its magic can't sniff
    as that kind either."""
    return df.filter(
        F.substring(F.col("bytes"), 1, len(magic)) == F.lit(magic)
    )


def png_pixel_stats(df: DataFrame) -> DataFrame:
    """(clip_id, bytes) → decoded-pixel statistics for every PNG row."""
    return _with_px_mean(
        _magic_prefilter(df.select("clip_id", "bytes"), b"\x89PNG")
        .mapInPandas(extract_png_pixel_stats, PIXEL_STATS_SCHEMA)
    )


def extract_jpeg_pixel_stats(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (clip_id, bytes) → REAL decoded-pixel stats for
    JPEG payloads (baseline grayscale entropy decode, functions/jpeg.py).
    Geometry comes from the SOF marker walk (header fact — available even
    when entropy decode fails, e.g. a header-only or progressive stream);
    pixel stats only from a successful full decode. Non-JPEG rows are
    dropped in the worker, mirroring ``extract_png_pixel_stats``."""
    from ..functions.jpeg import decode_jpeg_gray

    for pdf in batches:
        out = {k.name: [] for k in PIXEL_STATS_SCHEMA.fields}
        for cid, raw in zip(pdf["clip_id"], pdf["bytes"]):
            payload = bytes(raw) if raw is not None else None
            if _sniff_kind(payload) != "jpeg":
                continue
            sof = _jpeg_sof(payload)
            w, h, ch = sof if sof else (0, 0, 0)
            _append_pixel_row(out, cid, w, h, ch, decode_jpeg_gray(payload))
        yield pd.DataFrame(out, columns=[f.name for f in PIXEL_STATS_SCHEMA])


def jpeg_pixel_stats(df: DataFrame) -> DataFrame:
    """(clip_id, bytes) → decoded-pixel statistics for every JPEG row;
    same output contract as ``png_pixel_stats`` (channels, like geometry,
    is the SOF header's component count — a header fact available even
    when entropy decode fails)."""
    return _with_px_mean(
        _magic_prefilter(df.select("clip_id", "bytes"), b"\xff\xd8\xff")
        .mapInPandas(extract_jpeg_pixel_stats, PIXEL_STATS_SCHEMA)
    )


def with_image_quality_class(stats: DataFrame) -> DataFrame:
    """First-match-wins image-quality cascade over decoded pixel stats —
    the image-modality analog of the transcript rule cascade
    (operators/cascade.py, reference analog P2-P5): pure codegen over the
    integer columns the pixel workers emit, so at scale the expensive part
    (decode) runs once and every rule evaluation is JVM-side.

    Classes, in rule order: undecodable → constant (a stuck or synthetic
    frame: every value equal) → low_contrast (dynamic range < 32 LSB) →
    dark (mean < 16) → bright (mean > 239) → ok."""
    rng = F.col("px_max") - F.col("px_min")
    mean = F.col("px_sum") / F.col("n_vals")
    return stats.withColumn(
        "quality_class",
        F.when(~F.col("decode_ok"), F.lit("undecodable"))
        .when(rng == 0, F.lit("constant"))
        .when(rng < 32, F.lit("low_contrast"))
        .when(mean < 16, F.lit("dark"))
        .when(mean > 239, F.lit("bright"))
        .otherwise(F.lit("ok")),
    )


def image_quality_summary(df: DataFrame) -> DataFrame:
    """Mixed media table → per (kind, quality_class) counts + mean pixel
    level: ONE decode pass per format, classes in codegen, one slim
    aggregate exchange."""
    png = with_image_quality_class(png_pixel_stats(df)).withColumn(
        "kind", F.lit("png")
    )
    jpg = with_image_quality_class(jpeg_pixel_stats(df)).withColumn(
        "kind", F.lit("jpeg")
    )
    return (
        png.unionByName(jpg)
        .groupBy("kind", "quality_class")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("n_vals").alias("total_vals"),
            F.round(
                F.avg(F.col("px_sum") / F.col("n_vals")) + F.lit(1e-9), 6
            ).alias("avg_level"),
        )
        .orderBy("kind", "quality_class")
    )


def media_kind_summary(df: DataFrame) -> DataFrame:
    return with_media_meta(df).groupBy("kind").agg(
        F.count("*").alias("n_clips"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum(F.when(F.col("media_ok"), 1).otherwise(0)).cast("bigint").alias("n_ok"),
        F.sum("n_frames").cast("bigint").alias("total_frames"),
        # geometry sums pin the IHDR parse (png) and the SOF marker walk
        # (jpeg) under the DuckDB oracle; 0 for non-image kinds
        F.sum("width").cast("bigint").alias("sum_width"),
        F.sum("height").cast("bigint").alias("sum_height"),
    )


# ---------------------------------------------------------------------------
# image resize (the remaining multimodal verb: decode → NN-downsample →
# re-encode; real end-to-end with the in-tree PNG codec)
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("resized_png", T.BinaryType()),
        T.StructField("n_vals", T.LongType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
    ]
)


def resize_dims(w: int, h: int, max_dim: int) -> tuple[int, int]:
    """Deterministic integer thumbnail geometry: downscale so the longer
    side becomes ``max_dim`` (floor arithmetic, aspect preserved, never
    below 1); images already within bounds keep their size — an upscale
    invents no information and doubles the bytes."""
    m = max(w, h)
    if m <= max_dim:
        return w, h
    return max(1, (w * max_dim) // m), max(1, (h * max_dim) // m)


def extract_resized_png(max_dim: int):
    """mapInPandas worker factory: (clip_id, bytes) → nearest-neighbor
    thumbnail re-encoded as PNG + exact integer stats of the RESIZED
    pixels. NN index map: out (r, c) reads src ((r*h)//out_h,
    (c*w)//out_w) — pure integer floor arithmetic so a SQL oracle can
    regenerate the sampled pixel set. Geometry is a header fact (emitted
    with decode_ok=false and NULL stats when the stream doesn't decode);
    the payload dies in the worker and only the ~1-3 KB thumbnail
    returns."""
    from ..functions.png import _CTYPE_CHANNELS, decode_png, encode_png

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in RESIZE_SCHEMA.fields}
            for cid, raw in zip(pdf["clip_id"], pdf["bytes"]):
                payload = bytes(raw) if raw is not None else None
                if _sniff_kind(payload) != "png":
                    continue
                if len(payload) < 26:
                    w = h = ch = 0
                    img = None
                else:
                    w, h = _png_dims(payload)
                    ch = _CTYPE_CHANNELS.get(payload[25], 0)
                    img = decode_png(payload)
                out["clip_id"].append(cid)
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["channels"].append(int(ch))
                if img is None:
                    out["out_w"].append(0)
                    out["out_h"].append(0)
                    out["decode_ok"].append(False)
                    out["resized_png"].append(None)
                    out["n_vals"].append(None)
                    out["px_sum"].append(None)
                    out["px_min"].append(None)
                    out["px_max"].append(None)
                    continue
                ow, oh = resize_dims(w, h, max_dim)
                rows = (np.arange(oh, dtype=np.int64) * h) // oh
                cols = (np.arange(ow, dtype=np.int64) * w) // ow
                small = img[np.ix_(rows, cols)]
                flat = small.reshape(-1).astype(np.int64)
                out["out_w"].append(ow)
                out["out_h"].append(oh)
                out["decode_ok"].append(True)
                out["resized_png"].append(encode_png(small))
                out["n_vals"].append(int(flat.size))
                out["px_sum"].append(int(flat.sum()))
                out["px_min"].append(int(flat.min()))
                out["px_max"].append(int(flat.max()))
            yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA])

    return worker


def png_resize(df: DataFrame, max_dim: int = 24) -> DataFrame:
    """(clip_id, bytes) → NN thumbnail + resized-pixel stats per PNG row."""
    if max_dim <= 0:
        raise ValueError(f"max_dim must be positive, got {max_dim}")
    return _magic_prefilter(
        df.select("clip_id", "bytes"), b"\x89PNG"
    ).mapInPandas(extract_resized_png(max_dim), RESIZE_SCHEMA)


def png_resize_stats(df: DataFrame, max_dim: int = 24) -> DataFrame:
    """Oracle-facing projection of ``png_resize``: everything except the
    thumbnail bytes (zlib output is not SQL-recomputable; the bytes are
    pinned by pytest round-trip instead), mean derived in codegen from
    the exact integers."""
    return (
        png_resize(df, max_dim)
        .drop("resized_png")
        .withColumn(
            "px_mean",
            F.round(F.col("px_sum") / F.col("n_vals") + F.lit(1e-9), 6),
        )
    )
