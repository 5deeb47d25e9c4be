"""The fused single-crossing stage and the split decode→text composition
must produce identical results (same functions/, different plan shapes) —
this keeps the composable operators from bitrotting while the pipeline
defaults to the fused path."""

from __future__ import annotations

from wallaby2caom2_spark.plans.pipeline import quality_filter


def _key(rows):
    return {
        r["clip_id"]: (
            r["keep"],
            r["drop_reason"],
            r["scrubbed_transcript"],
            r["scrub_edits"],
            r["lang"],
            round(float(r["ppl"]), 6),
            r["pcm_ok"],
            r["dur_ms_meas"],
        )
        for r in rows
    }


def test_fused_equals_split(spark, clips_df):
    fused = _key(quality_filter(clips_df, fused=True).collect())
    split = _key(quality_filter(clips_df, fused=False).collect())
    assert fused == split
