"""Numerical-identity pins for the fused audio passes.

Three operators share the per-clip decode→signal math (the ``_SignalArrays``
helper): the standalone gates (vad_stats / spectral_stats /
with_fingerprint), the survivors-only fused pass (``audio_signals``), and
the whole-corpus single pass the curation DAG runs
(``quality_and_signals``). A divergence in the shared int16→float conversion
or in any per-clip helper would silently skew the funnel, so equality is
asserted per clip, per field, on the same fixture rows.
"""

from __future__ import annotations

from wallaby2caom2_spark.operators import spectral, vad
from wallaby2caom2_spark.operators.audio_fp import with_fingerprint
from wallaby2caom2_spark.operators.audio_signals import (
    audio_signals,
    quality_and_signals,
)

VAD_FIELDS = ["n_frames", "n_speech_frames", "speech_ratio", "n_speech_runs", "snr_db"]
SPEC_FIELDS = ["spec_ok", "flatness", "centroid_hz", "peak_share"]


def _by_id(df, fields):
    return {
        r["clip_id"]: tuple(r[c] for c in fields)
        for r in df.select("clip_id", *fields).collect()
    }


def test_audio_signals_matches_standalone_ops(spark, clips_df):
    sig = audio_signals(clips_df)
    sig.persist()
    try:
        # VAD block == vad_stats (for clips both consider decodable; the
        # operators share the containment rule, so the ok sets also match)
        got_vad = _by_id(sig.filter("sig_ok"), VAD_FIELDS)
        exp_vad = _by_id(vad.vad_stats(clips_df).filter("vad_ok"), VAD_FIELDS)
        assert got_vad == exp_vad
        # spectral block == spectral_stats
        got_spec = _by_id(sig.filter("sig_ok"), SPEC_FIELDS)
        exp = _by_id(spectral.spectral_stats(clips_df), SPEC_FIELDS)
        for cid, row in got_spec.items():
            assert row == exp[cid], cid
        # fingerprint block == with_fingerprint
        got_fp = _by_id(sig, ["fp_ok", "fp"])
        exp_fp = _by_id(with_fingerprint(clips_df), ["fp_ok", "fp"])
        for cid, (ok, fp) in got_fp.items():
            if ok:  # sig gates rateless clips before fingerprinting
                assert (ok, fp) == exp_fp[cid], cid
    finally:
        sig.unpersist()


def test_quality_and_signals_matches_both_parents(spark, clips_df):
    """The curation DAG's single pass must equal (a) audio_signals on every
    gate field and (b) the flagship fused stage on every quality field.
    (signals_for_dropped=True: the per-row numerical identity must hold on
    EVERY clip; the default gated path is pinned separately below.)"""
    from wallaby2caom2_spark.operators.fused_stage import with_fused_features

    qs = quality_and_signals(clips_df, signals_for_dropped=True)
    qs.persist()
    try:
        sig_fields = ["sig_ok", "fp_ok", "fp"] + VAD_FIELDS + SPEC_FIELDS
        assert _by_id(qs, sig_fields) == _by_id(audio_signals(clips_df), sig_fields)
        q_fields = [
            "pcm_ok", "sr_meas", "dur_ms_meas", "rms", "clip_rate",
            "dropout_ms", "lang", "lang_conf", "ppl", "scrubbed_all",
            "scrub_edits_all",
        ]
        assert _by_id(qs, q_fields) == _by_id(
            with_fused_features(clips_df), q_fields
        )
    finally:
        qs.unpersist()


def test_gated_signals_match_for_kept_clips(spark, clips_df):
    """The DEFAULT path skips the FFT signal block for quality-dropped
    clips. Pins: (a) the in-worker decision chain
    (oracle.drop_reason_from_features) agrees with the codegen cascade on
    every clip — skipped == dropped, exactly; (b) kept clips' signals are
    bit-identical to the unconditional pass; (c) dropped clips carry the
    sig_ok=false containment defaults."""
    from wallaby2caom2_spark.plans.pipeline import quality_filter

    gated = quality_and_signals(clips_df)
    full = quality_and_signals(clips_df, signals_for_dropped=True)
    labels = {
        r["clip_id"]: (r["keep"], r["drop_reason"])
        for r in quality_filter(clips_df)
        .select("clip_id", "keep", "drop_reason")
        .collect()
    }
    sig_fields = ["sig_ok", "fp_ok", "fp"] + VAD_FIELDS + SPEC_FIELDS
    got = _by_id(gated, sig_fields)
    exp = _by_id(full, sig_fields)
    assert set(got) == set(labels)
    n_kept = n_dropped = 0
    for cid, row in got.items():
        keep, reason = labels[cid]
        if keep or reason == "repetition":
            # repetition is the gate's deliberate no-skip arm (its input
            # tokenization could diverge from codegen on exotic control
            # chars), so those dropped clips also carry full signals
            assert row == exp[cid], cid
            n_kept += keep
        else:
            # (sig_ok, fp_ok, fp, VAD ints/floats, spec fields) defaults
            assert row[0] is False and row[1] is False and row[2] == 0, cid
            assert row[3] == 0 and row[4] == 0, cid  # n_frames, n_speech
            n_dropped += 1
    assert n_kept > 0 and n_dropped > 0  # corpus exercises both arms


def test_staged_output_identical_with_and_without_gating(spark, clips_df):
    """End-to-end pin for the funnel: the (clip_id -> stage) labeling is
    identical whether dropped clips' signals are computed or skipped."""
    from wallaby2caom2_spark.plans.curate import _staged

    gated = {
        r["clip_id"]: r["stage"] for r in _staged(clips_df).collect()
    }
    full = {
        r["clip_id"]: r["stage"]
        for r in _staged(clips_df, signals_for_dropped=True).collect()
    }
    assert gated == full
