"""Multimodal plumbing tests: opaque-binary metadata extraction via
mapInPandas (S11 analog — the preview visitor re-expressed as one
Arrow-batched stage). Geometry is real for both image kinds: PNG IHDR
parse and JPEG SOF marker walk, both stdlib."""

from __future__ import annotations

from pyspark.sql import functions as F

from wallaby2caom2_spark import datagen
from wallaby2caom2_spark.operators import multimodal


def test_media_meta_schema_and_kinds(spark, tmp_path):
    path = str(tmp_path / "clips")
    datagen.write_clips_parquet(path, 200, seed=5, rows_per_file=100)
    clips = spark.read.parquet(path)
    meta = multimodal.with_media_meta(clips)
    assert set(meta.columns) == {
        "clip_id",
        "kind",
        "n_bytes",
        "media_ok",
        "width",
        "height",
        "n_frames",
    }
    rows = meta.collect()
    assert len(rows) == 200
    kinds = {r["kind"] for r in rows}
    # generator emits wav, fake-flac, raw pcm, and the odd empty payload
    assert "wav" in kinds and "flac" in kinds and "raw" in kinds
    for r in rows:
        if r["kind"] in ("wav", "flac") and r["media_ok"]:
            assert r["n_frames"] >= 1
        if r["kind"] in ("empty", "raw"):
            assert not r["media_ok"]


def test_kind_summary_totals(spark, tmp_path):
    path = str(tmp_path / "clips")
    datagen.write_clips_parquet(path, 150, seed=6, rows_per_file=75)
    clips = spark.read.parquet(path)
    summary = multimodal.media_kind_summary(clips)
    total = summary.agg(F.sum("n_clips")).collect()[0][0]
    assert total == 150
    # byte totals must equal the raw payload sizes (no silent truncation)
    raw_total = clips.agg(
        F.sum(F.coalesce(F.length("bytes"), F.lit(0)))
    ).collect()[0][0]
    sum_total = summary.agg(F.sum("total_bytes")).collect()[0][0]
    assert sum_total == raw_total


def test_jpeg_sof_walk_is_real():
    """JPEG width/height come from walking the marker chain to SOF0 (stdlib
    parse) — plain layout, COM-segment layout, fill bytes before a marker,
    and every corrupt-chain bail-out branch."""
    from wallaby2caom2_spark.datagen import encode_jpeg_header

    plain = encode_jpeg_header(640, 480, b"entropy" * 9)
    with_com = encode_jpeg_header(1920, 1080, b"x" * 50, comment=b"meta!")
    assert multimodal._jpeg_dims(plain) == (640, 480)
    assert multimodal._jpeg_dims(with_com) == (1920, 1080)
    # fill bytes (repeated 0xFF) before a marker are legal padding
    padded = plain[:2] + b"\xff\xff\xff" + plain[2:]
    assert multimodal._jpeg_dims(padded) == (640, 480)
    # corrupt chains: stuffed byte where a marker belongs, zero segment
    # length, SOS before SOF, truncation inside the SOF segment
    assert multimodal._jpeg_dims(b"\xff\xd8\xff\x00" + b"z" * 64) is None
    assert multimodal._jpeg_dims(b"\xff\xd8\xff\xe0\x00\x01" + b"z" * 8) is None
    assert multimodal._jpeg_dims(b"\xff\xd8\xff\xda\x00\x04ab" + b"z" * 8) is None
    assert multimodal._jpeg_dims(plain[:24]) is None
    assert multimodal._jpeg_dims(b"\xff\xd8") is None


def test_jpeg_geometry_through_spark(spark):
    """End-to-end through the mapInPandas stage: real geometry for both
    layouts, media_ok=false (zero geometry) for the corrupt row."""
    from wallaby2caom2_spark.datagen import encode_jpeg_header

    rows = [
        ("a", bytearray(encode_jpeg_header(300, 200, b"e" * 40))),
        ("b", bytearray(encode_jpeg_header(77, 55, b"e" * 9, comment=b"cc"))),
        ("bad", bytearray(b"\xff\xd8\xff\x00" + b"e" * 40)),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    got = {
        r["clip_id"]: (r["media_ok"], r["width"], r["height"], r["n_frames"])
        for r in multimodal.with_media_meta(df).collect()
    }
    assert got["a"] == (True, 300, 200, 1)
    assert got["b"] == (True, 77, 55, 1)
    assert got["bad"] == (False, 0, 0, 0)


def test_png_geometry_is_real(spark):
    """PNG width/height come from the IHDR chunk (stdlib parse), not the
    stub — round-trip through the in-tree encoder, including non-square and
    1-pixel edge geometries; a too-short png payload is contained as
    media_ok=false."""
    import numpy as np

    from wallaby2caom2_spark.functions.preview import encode_png_gray

    cases = [(13, 7), (1, 1), (257, 3)]  # (w, h)
    rows = []
    for i, (w, h) in enumerate(cases):
        img = ((np.arange(w * h) * 3) % 251).astype(np.uint8).reshape(h, w)
        rows.append((f"p{i}", bytearray(encode_png_gray(img))))
    rows.append(("short", bytearray(b"\x89PNG\r\n\x1a\n" + b"x" * 8)))  # 16 B
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    got = {
        r["clip_id"]: (r["media_ok"], r["width"], r["height"])
        for r in multimodal.with_media_meta(df).collect()
    }
    for i, (w, h) in enumerate(cases):
        assert got[f"p{i}"] == (True, w, h)
    assert got["short"] == (False, 0, 0)


def test_media_fixture_covers_all_kinds(spark):
    """The image-mix side table (datagen.generate_media_rows) must exercise
    png + jpeg + raw + empty, with real decodable PNG geometry AND pixels
    (gray + RGB, all five scanline filters, one truncated-IDAT row)."""
    from wallaby2caom2_spark import datagen as dg
    from wallaby2caom2_spark.functions.png import decode_png

    rows = dg.generate_media_rows(40, seed=42)
    kinds = {multimodal._sniff_kind(r["bytes"]) for r in rows}
    assert kinds == {"png", "jpeg", "raw", "empty"}
    n_jpeg_ok = n_jpeg_bad = n_gray = n_rgb = n_trunc = 0
    for i, r in enumerate(rows):
        kind = multimodal._sniff_kind(r["bytes"])
        if kind == "png":
            img = decode_png(bytes(r["bytes"]))
            w, h = multimodal._png_dims(r["bytes"])
            if i % 50 == 10:  # truncated after IHDR: geometry yes, pixels no
                assert img is None and (w, h) != (0, 0)
                n_trunc += 1
                continue
            assert (h, w) == img.shape[:2]
            if img.ndim == 2:
                n_gray += 1
            else:
                assert img.shape[2] == 3
                n_rgb += 1
        elif kind == "jpeg":
            dims = multimodal._jpeg_dims(bytes(r["bytes"]))
            if i % 10 == 7:  # the corrupt layout
                assert dims is None
                n_jpeg_bad += 1
            elif i % 10 == 5:
                # full baseline JPEG: replay the block-count draws
                rng = dg._rng(42 + 7_000_000, i)
                bw8 = 2 + int(rng.integers(0, 12))
                bh8 = 2 + int(rng.integers(0, 8))
                assert dims == (bw8 * 8, bh8 * 8)
                from wallaby2caom2_spark.functions.jpeg import (
                    decode_jpeg_gray,
                )

                assert decode_jpeg_gray(bytes(r["bytes"])) is not None
                n_jpeg_ok += 1
            else:
                # header-only: replay the generator's rng draws
                # (body_len, then w, then h) rather than re-parsing bytes
                rng = dg._rng(42 + 7_000_000, i)
                rng.integers(0, 4096)  # body_len draw
                w = 16 + int(rng.integers(0, 2000))
                h = 16 + int(rng.integers(0, 1200))
                assert dims == (w, h)
                n_jpeg_ok += 1
    assert n_jpeg_ok >= 4 and n_jpeg_bad >= 2
    assert n_gray >= 4 and n_rgb >= 4 and n_trunc == 1
    # determinism (the oracle regenerates the same table)
    again = dg.generate_media_rows(40, seed=42)
    assert [r["bytes"] for r in again] == [r["bytes"] for r in rows]
