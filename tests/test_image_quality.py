"""Image-quality gate tests (operators/multimodal.py
with_image_quality_class / image_quality_summary): every rule arm on
synthetic frames, first-match-wins order, and full class coverage over
the media fixture."""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark import datagen as dg
from wallaby2caom2_spark.functions.png import encode_png
from wallaby2caom2_spark.operators import multimodal


def _frame(fill_fn, h=16, w=16):
    k = np.arange(h * w, dtype=np.int64)
    return fill_fn(k).astype(np.uint8).reshape(h, w)


def test_every_rule_arm_on_synthetic_frames(spark):
    cases = {
        # (clip_id, image or None) -> expected class
        "ok": _frame(lambda k: (k * 3) % 251),
        "constant": _frame(lambda k: np.full_like(k, 140)),
        "low_contrast": _frame(lambda k: 100 + (k % 8) * 4),  # range 28
        "dark": _frame(lambda k: np.where(k % 127 == 0, 255, 0)),
        "bright": _frame(lambda k: np.where(k % 127 == 0, 0, 255)),
    }
    rows = [
        (name, bytearray(encode_png(img))) for name, img in cases.items()
    ]
    # undecodable: IHDR parses, IDAT missing
    rows.append(("undecodable", bytearray(encode_png(cases["ok"]))[:33]))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    got = {
        r["clip_id"]: r["quality_class"]
        for r in multimodal.with_image_quality_class(
            multimodal.png_pixel_stats(df)
        ).collect()
    }
    assert got == {name: name for name in got}
    assert set(got) == set(cases) | {"undecodable"}


def test_rule_order_is_first_match_wins(spark):
    """A constant DARK frame must classify as 'constant' (earlier rule),
    not 'dark' — same contract as the transcript cascade."""
    img = _frame(lambda k: np.zeros_like(k))  # constant AND mean < 16
    df = spark.createDataFrame(
        [("x", bytearray(encode_png(img)))], "clip_id string, bytes binary"
    )
    row = multimodal.with_image_quality_class(
        multimodal.png_pixel_stats(df)
    ).collect()[0]
    assert row["quality_class"] == "constant"


def test_fixture_covers_every_class(spark):
    """The v5 media fixture plants one PNG row per class (the
    datagen.png_pixel_values sub-rules), so the oracle-checked rollup
    exercises every rule arm."""
    rows = dg.generate_media_rows(200, seed=42)
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"])) for r in rows],
        "clip_id string, bytes binary",
    )
    out = {
        (r["kind"], r["quality_class"]): r["n_images"]
        for r in multimodal.image_quality_summary(df).collect()
    }
    for cls in ("ok", "constant", "low_contrast", "dark", "bright",
                "undecodable"):
        assert out.get(("png", cls), 0) >= 1, cls
    assert out.get(("jpeg", "ok"), 0) >= 1
    assert out.get(("jpeg", "undecodable"), 0) >= 1
    # totals: every png/jpeg row lands in exactly one class
    assert sum(n for (k, _), n in out.items() if k == "png") == 100
    assert sum(n for (k, _), n in out.items() if k == "jpeg") == 60
