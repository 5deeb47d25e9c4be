"""Image-resize operator tests (operators/multimodal.py ``png_resize``):
the thumbnail bytes are a REAL decode → nearest-neighbor downsample →
re-encode through the in-tree PNG codec. The DuckDB oracle for
``multimodal_image_resize`` can only verify the sampled-pixel INTEGERS
(zlib output is not SQL-recomputable), so the byte round-trip — thumbnail
decodes back to exactly the NN-sampled pixel grid — is pinned here."""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.functions.png import decode_png, encode_png
from wallaby2caom2_spark.operators.multimodal import (
    png_resize,
    png_resize_stats,
    resize_dims,
)


@pytest.mark.parametrize(
    ("w", "h", "md", "want"),
    [
        (10, 10, 24, (10, 10)),  # within bounds: no upscale
        (24, 24, 24, (24, 24)),  # exactly at bound
        (48, 24, 24, (24, 12)),  # wide: longer side → md, aspect kept
        (24, 48, 24, (12, 24)),  # tall
        (100, 3, 24, (24, 1)),  # extreme aspect: floor would hit 0 → 1
        (3, 100, 24, (1, 24)),
        (7, 5, 4, (4, 2)),  # floor arithmetic, not round
    ],
)
def test_resize_dims_geometry(w, h, md, want):
    assert resize_dims(w, h, md) == want


def test_max_dim_must_be_positive(spark):
    with pytest.raises(ValueError):
        png_resize(spark.range(0).selectExpr(
            "'x' AS clip_id", "CAST(NULL AS BINARY) AS bytes"), 0)


def _img(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def _nn_reference(img, max_dim):
    """Serial reference of the worker's NN map — same floor arithmetic."""
    h, w = img.shape[:2]
    ow, oh = resize_dims(w, h, max_dim)
    rows = (np.arange(oh, dtype=np.int64) * h) // oh
    cols = (np.arange(ow, dtype=np.int64) * w) // ow
    return img[np.ix_(rows, cols)]


def _media_df(spark, payloads):
    return spark.createDataFrame(
        [(cid, bytearray(b) if b is not None else None)
         for cid, b in payloads],
        "clip_id string, bytes binary",
    )


def test_thumbnail_roundtrips_to_exact_nn_samples(spark):
    """decode(resized_png) == the NN-sampled pixel grid, per channel count,
    and the stats columns are the exact integers of that grid."""
    imgs = {
        "gray": _img((40, 31), 1),
        "rgb": _img((29, 64, 3), 2),
        "rgba": _img((50, 50, 4), 3),
    }
    df = _media_df(
        spark, [(cid, encode_png(im)) for cid, im in imgs.items()]
    )
    got = {r["clip_id"]: r for r in png_resize(df, 24).collect()}
    assert set(got) == set(imgs)
    for cid, img in imgs.items():
        r = got[cid]
        ref = _nn_reference(img, 24)
        assert r["decode_ok"]
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        assert (r["out_w"], r["out_h"]) == (ref.shape[1], ref.shape[0])
        thumb = decode_png(bytes(r["resized_png"]))
        assert thumb is not None and thumb.shape == ref.shape
        assert (thumb == ref).all(), cid
        flat = ref.reshape(-1).astype(np.int64)
        assert r["n_vals"] == flat.size
        assert r["px_sum"] == int(flat.sum())
        assert r["px_min"] == int(flat.min())
        assert r["px_max"] == int(flat.max())


def test_small_image_passes_through_unscaled(spark):
    img = _img((9, 13, 3), 4)
    df = _media_df(spark, [("tiny", encode_png(img))])
    r = png_resize(df, 24).collect()[0]
    assert (r["out_w"], r["out_h"]) == (13, 9)
    assert (decode_png(bytes(r["resized_png"])) == img).all()


def test_corrupt_and_foreign_rows(spark):
    """PNG magic + broken body → geometry as a header fact, decode_ok
    false, NULL stats; rows without the PNG magic never reach the worker
    (codegen prefilter) and are absent from the output."""
    good = encode_png(_img((30, 30), 5))
    truncated = good[:25]  # magic but not even a full IHDR
    broken = good[:40] + b"\x00" * 10  # real IHDR, garbage stream
    df = _media_df(
        spark,
        [
            ("ok", good),
            ("trunc", truncated),
            ("broken", broken),
            ("wav", b"RIFF1234WAVEfmt "),
            ("null", None),
        ],
    )
    got = {r["clip_id"]: r for r in png_resize(df, 24).collect()}
    assert set(got) == {"ok", "trunc", "broken"}
    assert got["ok"]["decode_ok"]
    for cid in ("trunc", "broken"):
        r = got[cid]
        assert not r["decode_ok"]
        assert r["resized_png"] is None
        assert r["n_vals"] is None and r["px_sum"] is None
        assert (r["out_w"], r["out_h"]) == (0, 0)
    # header geometry is still reported when the IHDR itself was intact
    assert (got["broken"]["width"], got["broken"]["height"]) == (30, 30)
    assert (got["trunc"]["width"], got["trunc"]["height"]) == (0, 0)


def test_stats_projection_drops_payload_and_derives_mean(spark):
    img = _img((60, 45), 6)
    df = _media_df(spark, [("a", encode_png(img))])
    r = png_resize_stats(df, 24).collect()[0]
    assert "resized_png" not in png_resize_stats(df, 24).columns
    ref = _nn_reference(img, 24).reshape(-1).astype(np.int64)
    want = round(float(ref.sum()) / ref.size + 1e-9, 6)
    assert r["px_mean"] == pytest.approx(want, abs=1e-9)
