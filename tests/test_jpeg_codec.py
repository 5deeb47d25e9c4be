"""Baseline JPEG codec tests (functions/jpeg.py): exact round trip on
block-constant input, near-lossless on arbitrary input at flat quant,
spec-table pins, corruption containment, and the Spark operator vs a
serial decode loop."""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.functions.jpeg import (
    AC_BITS,
    DC_BITS,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _block_img(bh, bw, seed):
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, size=(bh, bw), dtype=np.int64)
    return np.kron(blocks, np.ones((8, 8), np.int64)).astype(np.uint8)


@pytest.mark.parametrize("shape", [(1, 1), (3, 7), (8, 2)])
def test_block_constant_roundtrip_is_exact(shape):
    """Flat quant + 8x8-block-constant pixels: only the DC coefficient is
    non-zero and it quantizes losslessly — the decode must be EXACT.
    This is the law the analytic DuckDB oracle relies on."""
    img = _block_img(*shape, seed=shape[0] * 10 + shape[1])
    out = decode_jpeg_gray(encode_jpeg_gray(img, quant=1))
    assert out is not None and out.shape == img.shape
    assert (out == img).all()


def test_arbitrary_image_roundtrip_near_lossless():
    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (5, 9), (24, 24), (17, 66)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(img, quant=1))
        assert out is not None and out.shape == (h, w)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_lossy_quant_still_decodes_close():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(40, 40), dtype=np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(img, quant=16))
    assert out is not None
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 8.0


def test_stream_structure_is_spec_shaped():
    """The emitted stream must satisfy independent structural readers: the
    SOF marker walk recovers geometry, the huffman tables are the public
    Annex K constants, and entropy data is byte-stuffed (no bare marker
    between SOS and EOI)."""
    from wallaby2caom2_spark.operators.multimodal import (
        _jpeg_dims,
        _sniff_kind,
    )

    img = _block_img(5, 7, seed=1)
    p = encode_jpeg_gray(img)
    assert _sniff_kind(p) == "jpeg"
    assert _jpeg_dims(p) == (56, 40)
    # Annex K table sizes (spec constants, not tuned to this encoder)
    assert sum(DC_BITS) == 12 and sum(AC_BITS) == 162
    # byte stuffing: between SOS and EOI every 0xFF is followed by 0x00
    sos = p.index(b"\xff\xda")
    # SOS segment = marker(2) + len(2) + body(6) for 1 component
    entropy = p[sos + 10 : -2]
    k = 0
    while True:
        k = entropy.find(b"\xff", k)
        if k == -1:
            break
        assert entropy[k + 1] == 0x00, k
        k += 2


def test_containment_of_corrupt_and_unsupported():
    img = _block_img(2, 2, seed=5)
    good = encode_jpeg_gray(img)
    assert decode_jpeg_gray(None) is None
    assert decode_jpeg_gray(b"") is None
    assert decode_jpeg_gray(good[:40]) is None  # truncated before SOS
    assert decode_jpeg_gray(good[:-12]) is None  # truncated entropy data
    # header-only stream (geometry yes, no DQT/DHT/SOS)
    from wallaby2caom2_spark.datagen import encode_jpeg_header

    assert decode_jpeg_gray(encode_jpeg_header(64, 48, b"f" * 80)) is None
    # progressive frame marker is rejected
    prog = bytearray(good)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    assert decode_jpeg_gray(bytes(prog)) is None
    # hostile SOF geometry: 65535x65535 from a tiny stream must be
    # rejected at the dimension bound, not attempted as a ~34 GB alloc
    import struct

    sof_at = good.index(b"\xff\xc0")
    hostile = bytearray(good)
    hostile[sof_at + 5 : sof_at + 9] = struct.pack(">HH", 65535, 65535)
    assert decode_jpeg_gray(bytes(hostile)) is None


def test_jpeg_pixel_stats_through_spark(spark):
    """The mapInPandas operator equals a serial decode loop over the media
    fixture: full JPEGs decode with exact stats, header-only and corrupt
    rows are contained, non-JPEG rows never appear."""
    from wallaby2caom2_spark import datagen as dg
    from wallaby2caom2_spark.operators import multimodal

    rows = dg.generate_media_rows(80, seed=42)
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"])) for r in rows],
        "clip_id string, bytes binary",
    )
    got = {
        r["clip_id"]: r.asDict()
        for r in multimodal.jpeg_pixel_stats(df).collect()
    }
    n_full = n_header = n_corrupt = 0
    for i, r in enumerate(rows):
        payload = r["bytes"]
        if not payload.startswith(b"\xff\xd8\xff"):
            assert r["clip_id"] not in got
            continue
        g = got[r["clip_id"]]
        if i % 10 == 5:  # full baseline JPEG
            img = decode_jpeg_gray(payload)
            flat = img.reshape(-1).astype(np.int64)
            assert g["decode_ok"] is True and g["channels"] == 1
            assert (g["height"], g["width"]) == img.shape
            assert g["n_vals"] == flat.size and g["px_sum"] == flat.sum()
            assert g["px_min"] == flat.min() and g["px_max"] == flat.max()
            # the generative law: block b holds (b * (i + 3)) % 251
            bh, bw = img.shape[0] // 8, img.shape[1] // 8
            expect = (np.arange(bh * bw, dtype=np.int64) * (i + 3)) % 251
            assert (
                img[::8, ::8].reshape(-1) == expect
            ).all(), i  # exact decode
            n_full += 1
        elif i % 10 == 6:  # header-only: geometry yes, pixels no
            # channels is a HEADER fact: the SOF declares 1 component
            assert g["decode_ok"] is False and g["channels"] == 1
            assert g["width"] > 0 and g["px_sum"] is None
            n_header += 1
        else:  # corrupt marker chain: nothing parses
            assert g["decode_ok"] is False
            assert g["width"] == 0 and g["height"] == 0
            n_corrupt += 1
    assert n_full >= 4 and n_header >= 4 and n_corrupt >= 4
