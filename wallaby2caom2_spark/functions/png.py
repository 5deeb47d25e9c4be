"""Full PNG pixel codec — stdlib ``zlib``/``struct`` + numpy, no image lib.

The multimodal stage needs REAL pixel decode, not just geometry: quality
filters over image columns (mean luminance, dynamic range, constant-frame
detection) read pixel values. This container has no imaging library, but a
PNG is just zlib-deflated filter-prefixed scanlines (the repo already
hand-writes them for the preview sink, functions/preview.py), so the
decoder is ~80 lines of first-party code.

Encoder: 8-bit grayscale (color type 0), RGB (2) or RGBA (6) with a
per-row choice of ALL FIVE spec filters (None/Sub/Up/Average/Paeth) — the
media fixture uses it to emit images whose scanlines exercise every
unfilter path, so a decoder that silently skips unfiltering cannot pass
the pixel-stats oracle.

Decoder: bit depth 8, color types 0/2/6, filters 0-4, multi-IDAT,
non-interlaced, CRC-checked. Anything else (16-bit, palette, Adam7,
truncated or corrupt stream) → ``None``, which downstream maps to
``decode_ok = false`` — same containment convention as the audio decoder.

Unfiltering is sequential by spec (each byte may depend on the previous
pixel), but Sub reduces to a per-channel cumulative sum and Up to one
vectorized row add; only Average/Paeth rows fall back to a per-byte loop.
At cluster scale this runs inside Arrow-batched ``mapInPandas`` workers —
per-image cost is bounded by the image, never by the partition.

Reference analog: the preview/thumbnail visitor is the reference's only
binary→pixels step (``wallaby2caom2/preview_augmentation.py:77-97``, via
matplotlib); here the decode itself is first-party and testable.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CTYPE_CHANNELS = {0: 1, 2: 3, 6: 4}
_CHANNELS_CTYPE = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (encode side reads only original bytes,
    so the whole row can be predicted at once)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(img: np.ndarray, filters=None) -> bytes:
    """(h, w) or (h, w, 3|4) uint8 → PNG bytes, one filter byte per row.

    ``filters``: None → all rows filter 0 (byte-identical to the preview
    sink's ``encode_png_gray`` for grayscale input), an int → every row,
    or a length-h sequence. Filtering reads only ORIGINAL pixel values
    (per spec the predictor uses unfiltered neighbors), so every filter
    row vectorizes."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("expected (h, w[, c]) uint8")
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    if ch not in _CHANNELS_CTYPE:
        raise ValueError(f"unsupported channel count {ch}")
    if filters is None:
        filters = [0] * h
    elif isinstance(filters, int):
        filters = [filters] * h
    if len(filters) != h:
        raise ValueError("need one filter per row")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CHANNELS_CTYPE[ch], 0, 0, 0)
    flat = img.reshape(h, w * ch).astype(np.int64)
    zero = np.zeros(w * ch, dtype=np.int64)
    out = bytearray()
    for r in range(h):
        f = int(filters[r])
        cur, prev = flat[r], (flat[r - 1] if r else zero)
        left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - (left + prev) // 2
        elif f == 4:
            enc = cur - _paeth_vec(left, prev, upleft)
        else:
            raise ValueError(f"unknown filter {f}")
        out.append(f)
        out.extend((enc % 256).astype(np.uint8).tobytes())
    idat = zlib.compress(bytes(out), 6)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray | None:
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    # int32 halves working memory vs int64; every intermediate fits (the
    # Sub prefix sum, which can exceed int32 on wide rows, runs in int64)
    out = np.zeros((h, stride), dtype=np.int32)
    zero = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = int(rows[r, 0])
        cur = rows[r, 1:].astype(np.int32)
        prev = out[r - 1] if r else zero
        if f == 0:
            out[r] = cur
        elif f == 1:  # Sub: per-channel prefix sum mod 256
            for j in range(ch):
                out[r, j::ch] = np.cumsum(cur[j::ch], dtype=np.int64) % 256
        elif f == 2:  # Up
            out[r] = (cur + prev) % 256
        elif f == 3:  # Average: sequential (depends on decoded left pixel)
            # plain-list loop: ~10x faster than numpy scalar indexing here
            cur_l = rows[r, 1:].tolist()
            prev_l = prev.tolist()
            row_l = [0] * stride
            for i in range(stride):
                left = row_l[i - ch] if i >= ch else 0
                row_l[i] = (cur_l[i] + (left + prev_l[i]) // 2) & 0xFF
            out[r] = row_l
        elif f == 4:  # Paeth: sequential
            cur_l = rows[r, 1:].tolist()
            prev_l = prev.tolist()
            row_l = [0] * stride
            for i in range(stride):
                a = row_l[i - ch] if i >= ch else 0
                b = prev_l[i]
                c = prev_l[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row_l[i] = (cur_l[i] + pred) & 0xFF
            out[r] = row_l
        else:
            return None
    img = out.astype(np.uint8)
    return img.reshape(h, w) if ch == 1 else img.reshape(h, w, ch)


def decode_png(payload: bytes | None) -> np.ndarray | None:
    """PNG bytes → (h, w[, c]) uint8 pixels, or None on anything the codec
    does not support or a corrupt/truncated stream (bad CRC, bad deflate,
    missing IDAT/IEND, wrong decompressed size)."""
    if not payload or not payload.startswith(_PNG_SIG):
        return None
    n = len(payload)
    pos = len(_PNG_SIG)
    w = h = ch = -1
    idat = bytearray()
    saw_ihdr = saw_iend = False
    while pos + 12 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        end = pos + 8 + length
        if end + 4 > n:
            return None
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : end]
        (crc,) = struct.unpack_from(">I", payload, end)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            return None
        if not saw_ihdr:
            if tag != b"IHDR" or length != 13:
                return None  # IHDR must come first, per spec
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (
                depth != 8
                or ctype not in _CTYPE_CHANNELS
                or comp != 0
                or filt != 0
                or interlace != 0
                or w == 0
                or h == 0
            ):
                return None
            ch = _CTYPE_CHANNELS[ctype]
            # containment bound: IHDR dimensions are UNTRUSTED — a tiny
            # deflate bomb (zlib expands up to ~1030x) plus a huge declared
            # geometry would otherwise OOM the executor at the decompress
            # or unfilter allocation. 64M samples ≈ 256 MB of int32 rows.
            if w * h * ch > 64_000_000:
                return None
            saw_ihdr = True
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            saw_iend = True
            break
        pos = end + 4
    if not (saw_ihdr and saw_iend and idat):
        return None
    expected = h * (w * ch + 1)
    try:
        # bounded inflate: ask for at most expected+1 bytes, so a stream
        # that would decompress past the declared geometry is rejected
        # without materializing it
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except (zlib.error, MemoryError):
        return None
    if len(raw) != expected or not d.eof or d.unconsumed_tail:
        return None
    return _unfilter(raw, w, h, ch)
