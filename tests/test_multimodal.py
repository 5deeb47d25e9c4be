"""Multimodal plumbing tests: opaque-binary metadata extraction via
mapInPandas (S11 analog — the preview visitor re-expressed as one
Arrow-batched stage; decode itself is stubbed, the plumbing is real)."""

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


def test_image_stub_is_deterministic():
    w1, h1 = multimodal._decode_image_stub(b"\x89PNG" + b"x" * 100)
    w2, h2 = multimodal._decode_image_stub(b"\x89PNG" + b"x" * 100)
    assert (w1, h1) == (w2, h2)


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
    png + jpeg + raw + empty, with real decodable PNG geometry."""
    from wallaby2caom2_spark import datagen as dg
    from wallaby2caom2_spark.functions.preview import decode_png_gray

    rows = dg.generate_media_rows(40, seed=42)
    kinds = {multimodal._sniff_kind(r["bytes"]) for r in rows}
    assert kinds == {"png", "jpeg", "raw", "empty"}
    for r in rows:
        if multimodal._sniff_kind(r["bytes"]) == "png":
            img = decode_png_gray(bytes(r["bytes"]))
            w, h = multimodal._png_dims(r["bytes"])
            assert (h, w) == img.shape
    # determinism (the oracle regenerates the same table)
    again = dg.generate_media_rows(40, seed=42)
    assert [r["bytes"] for r in again] == [r["bytes"] for r in rows]
