"""Bit-compatibility pins for the oracle-replay fixture (fixtures.py).

The fixture-backed DuckDB oracles only prove anything if the pure-Python
fixture values are BIT-identical to what the Spark UDFs emit — down to raw
(unrounded) doubles, since the gate's value hash rounds to 9 decimals.
These tests diff every fixture column against the live operators on the
same rows, using the gate's own normalization.
"""

from __future__ import annotations

import numpy as np
import pytest

from scripts.check_oracle import norm_cell


def _norm(v):
    return norm_cell(v)


@pytest.fixture(scope="module")
def fixture_rows(tmp_path_factory):
    from wallaby2caom2_spark import datagen
    from wallaby2caom2_spark.fixtures import build_features_fixture

    base = tmp_path_factory.mktemp("fixture")
    clips_path = str(base / "clips")
    datagen.write_clips_parquet(clips_path, 400, seed=13, rows_per_file=100)
    out = build_features_fixture(clips_path, str(base / "features"), workers=4)
    import glob

    import pyarrow.parquet as pq

    rows = []
    for part in sorted(glob.glob(f"{out}/*.parquet")):
        rows.extend(pq.read_table(part).to_pylist())
    return clips_path, {r["clip_id"]: r for r in rows}


def _clips_df(spark, clips_path):
    return spark.read.parquet(clips_path)


def test_fixture_matches_quality_filter_bitwise(spark, fixture_rows):
    from wallaby2caom2_spark.plans.pipeline import RESULT_COLUMNS, quality_filter

    clips_path, fix = fixture_rows
    got = quality_filter(_clips_df(spark, clips_path)).collect()
    assert len(got) == len(fix)
    for r in got:
        f = fix[r["clip_id"]]
        for col in RESULT_COLUMNS:
            if col == "clip_id":
                continue
            assert _norm(r[col]) == _norm(f[col]), (r["clip_id"], col)


def test_fixture_matches_vad_and_fingerprint_and_preview(spark, fixture_rows):
    from pyspark.sql import functions as F

    from wallaby2caom2_spark.operators import preview, vad
    from wallaby2caom2_spark.operators.audio_fp import with_fingerprint

    clips_path, fix = fixture_rows
    clips = _clips_df(spark, clips_path)

    vad_cols = [
        "vad_ok", "n_frames", "n_speech_frames", "speech_ratio",
        "n_speech_runs", "snr_db",
    ]
    for r in vad.vad_stats(clips).collect():
        f = fix[r["clip_id"]]
        for col in vad_cols:
            assert _norm(r[col]) == _norm(f[col]), (r["clip_id"], col)

    # fingerprint: the operator's rate gate (measured wins, rateless gated)
    for r in with_fingerprint(clips).select("clip_id", "fp_ok", "fp").collect():
        f = fix[r["clip_id"]]
        assert (r["fp_ok"], r["fp"]) == (f["fp_ok"], f["fp"]), r["clip_id"]

    # preview: ok flag, exact PNG byte length, reference-style name
    prev = preview.with_previews(clips).select(
        "clip_id", "prev_ok", F.length("thumb_png").alias("len"), "thumb_name"
    )
    for r in prev.collect():
        f = fix[r["clip_id"]]
        assert r["prev_ok"] == f["prev_ok"], r["clip_id"]
        assert (r["len"] or 0) == f["thumb_len"], r["clip_id"]
        assert r["thumb_name"] == f["thumb_name"], r["clip_id"]

    # spectrogram preview: same per-clip pin against the fixture replay
    sgram = preview.with_spectrograms(clips).select(
        "clip_id", "sgram_ok", F.length("sgram_png").alias("len"), "sgram_name"
    )
    for r in sgram.collect():
        f = fix[r["clip_id"]]
        assert r["sgram_ok"] == f["sgram_ok"], r["clip_id"]
        assert (r["len"] or 0) == f["sgram_len"], r["clip_id"]
        assert r["sgram_name"] == f["sgram_name"], r["clip_id"]


def test_fixture_matches_embedding(spark, fixture_rows):
    """v7 replay columns: the persisted embedding equals the live operator
    per clip, element-exact (raw doubles, no rounding) — the bit-identity
    the audio_embed oracles depend on."""
    from wallaby2caom2_spark.operators.embed import EMB_DIM, embed_clips

    clips_path, fix = fixture_rows
    clips = _clips_df(spark, clips_path)
    for r in embed_clips(clips).collect():
        f = fix[r["clip_id"]]
        assert r["emb_ok"] == f["emb_ok"], r["clip_id"]
        assert list(r["emb"]) == list(f["emb"]), r["clip_id"]
        assert len(r["emb"]) == EMB_DIM, r["clip_id"]


def test_fixture_matches_mfcc(spark, fixture_rows):
    """v8 replay columns: the persisted MFCC summary equals the live
    operator per clip, raw (unrounded) doubles included — the bit-identity
    the audio_mfcc_stats oracle depends on."""
    from wallaby2caom2_spark.operators.mfcc import mfcc_frames

    clips_path, fix = fixture_rows
    for r in mfcc_frames(_clips_df(spark, clips_path)).collect():
        f = fix[r["clip_id"]]
        assert r["mfcc_ok"] == f["mfcc_ok"], r["clip_id"]
        assert r["n_frames"] == f["mfcc_n_frames"], r["clip_id"]
        got_len = len(r["mfcc_bytes"]) if r["mfcc_bytes"] is not None else 0
        assert got_len == f["mfcc_len"], r["clip_id"]
        for col, live in (
            ("mfcc_c0", r["c0_mean"]),
            ("mfcc_c1", r["c1_mean"]),
            ("mfcc_c2", r["c2_mean"]),
        ):
            assert _norm(live) == _norm(f[col]), (r["clip_id"], col)


def test_fixture_matches_pitch(spark, fixture_rows):
    """v9 replay columns: the persisted F0 summary equals the live operator
    per clip, raw doubles included."""
    from wallaby2caom2_spark.operators.pitch import pitch_stats

    clips_path, fix = fixture_rows
    for r in pitch_stats(_clips_df(spark, clips_path)).collect():
        f = fix[r["clip_id"]]
        assert r["pitch_ok"] == f["pitch_ok"], r["clip_id"]
        assert r["n_frames"] == f["pitch_n_frames"], r["clip_id"]
        assert r["n_voiced"] == f["pitch_n_voiced"], r["clip_id"]
        assert _norm(r["voiced_ratio"]) == _norm(f["pitch_voiced_ratio"])
        assert _norm(r["mean_f0"]) == _norm(f["pitch_mean_f0"])


def test_fixture_matches_bandwidth(spark, fixture_rows):
    """v10 replay columns: the persisted bandwidth profile equals the live
    operator per clip, raw doubles included."""
    from wallaby2caom2_spark.operators.bandwidth import bandwidth_stats

    clips_path, fix = fixture_rows
    for r in bandwidth_stats(_clips_df(spark, clips_path)).collect():
        f = fix[r["clip_id"]]
        assert r["bw_ok"] == f["bw_ok"], r["clip_id"]
        assert r["upsample_suspect"] == f["bw_suspect"], r["clip_id"]
        for live, col in (
            (r["rolloff95_hz"], "bw_rolloff95"),
            (r["rolloff99_hz"], "bw_rolloff99"),
            (r["bw_ratio"], "bw_ratio"),
        ):
            assert _norm(live) == _norm(f[col]), (r["clip_id"], col)


def test_fixture_matches_reverb(spark, fixture_rows):
    """v11 replay columns: the persisted decay profile equals the live
    operator per clip, raw doubles included."""
    from wallaby2caom2_spark.operators.reverb import reverb_stats

    clips_path, fix = fixture_rows
    for r in reverb_stats(_clips_df(spark, clips_path)).collect():
        f = fix[r["clip_id"]]
        assert r["rev_ok"] == f["rev_ok"], r["clip_id"]
        for live, col in (
            (r["decay_db_s"], "rev_decay_db_s"),
            (r["rt60_ms"], "rev_rt60_ms"),
            (r["tail_ms"], "rev_tail_ms"),
        ):
            assert _norm(live) == _norm(f[col]), (r["clip_id"], col)


def test_fixture_matches_hum(spark, fixture_rows):
    """v11 replay columns: the persisted hum profile equals the live
    operator per clip, raw doubles included."""
    from wallaby2caom2_spark.operators.hum import hum_stats

    clips_path, fix = fixture_rows
    for r in hum_stats(_clips_df(spark, clips_path)).collect():
        f = fix[r["clip_id"]]
        assert r["hum_ok"] == f["hum_ok"], r["clip_id"]
        assert r["hum_hz"] == f["hum_hz"], r["clip_id"]
        assert r["hum_harmonics"] == f["hum_harmonics"], r["clip_id"]
        assert _norm(r["hum_ratio"]) == _norm(f["hum_ratio"]), r["clip_id"]


def test_fixture_matches_loudness(spark, fixture_rows):
    """v12 replay columns: the persisted gated-loudness profile equals the
    live operator per clip, raw doubles included."""
    from wallaby2caom2_spark.operators.loudness import loudness_stats

    clips_path, fix = fixture_rows
    for r in loudness_stats(_clips_df(spark, clips_path)).collect():
        f = fix[r["clip_id"]]
        assert r["loud_ok"] == f["loud_ok"], r["clip_id"]
        assert r["n_blocks"] == f["loud_blocks"], r["clip_id"]
        assert r["n_gated_blocks"] == f["loud_gated"], r["clip_id"]
        for live, col in (
            (r["lufs"], "loud_lufs"),
            (r["peak_dbfs"], "loud_peak_dbfs"),
            (r["block_range_db"], "loud_range_db"),
        ):
            assert _norm(live) == _norm(f[col]), (r["clip_id"], col)


def test_fixture_matches_syllable_and_compression(spark, fixture_rows):
    """v13 replay columns: the persisted syllable-rate and transcript-
    compressibility profiles equal the live operators per clip, raw
    doubles included."""
    from wallaby2caom2_spark.operators.syllable import syllable_stats
    from wallaby2caom2_spark.operators.textcomp import compression_stats

    clips_path, fix = fixture_rows
    for r in syllable_stats(_clips_df(spark, clips_path)).collect():
        f = fix[r["clip_id"]]
        assert r["syl_ok"] == f["syl_ok"], r["clip_id"]
        assert r["dur_ms"] == (f["syl_dur_ms"] if f["syl_ok"] else 0)
        assert r["n_chars"] == f["n_chars"], r["clip_id"]
        assert _norm(r["syl_rate_hz"]) == _norm(f["syl_rate"]), r["clip_id"]
        assert _norm(r["mod_share"]) == _norm(f["syl_share"]), r["clip_id"]
    for r in compression_stats(_clips_df(spark, clips_path)).collect():
        f = fix[r["clip_id"]]
        assert r["z_ok"] == f["z_ok"], r["clip_id"]
        assert r["raw_len"] == f["z_raw_len"], r["clip_id"]
        assert r["z_len"] == f["z_len"], r["clip_id"]
        assert _norm(r["z_ratio"]) == _norm(f["z_ratio"]), r["clip_id"]


def test_fixture_matches_health_and_transcode(spark, fixture_rows):
    """v14 replay columns: the persisted waveform-health and canonical-
    transcode profiles equal the live operators per clip, raw doubles and
    checksums included."""
    from wallaby2caom2_spark.operators.health import health_stats
    from wallaby2caom2_spark.operators.transcode import transcode_stats

    clips_path, fix = fixture_rows
    for r in health_stats(_clips_df(spark, clips_path)).collect():
        f = fix[r["clip_id"]]
        assert r["wh_ok"] == f["wh_ok"], r["clip_id"]
        assert _norm(r["dc_offset"]) == _norm(f["wh_dc"]), r["clip_id"]
        assert _norm(r["crest_db"]) == _norm(f["wh_crest_db"]), r["clip_id"]
        assert _norm(r["peak"]) == _norm(f["wh_peak"]), r["clip_id"]
    for r in transcode_stats(_clips_df(spark, clips_path)).collect():
        f = fix[r["clip_id"]]
        assert r["tc_ok"] == f["tc_ok"], r["clip_id"]
        assert r["tc_exact"] == f["tc_exact"], r["clip_id"]
        assert r["canon_len"] == f["tc_canon_len"], r["clip_id"]
        assert r["canon_crc32"] == f["tc_crc32"], r["clip_id"]
        assert _norm(r["size_ratio"]) == _norm(f["tc_size_ratio"])


def test_fixture_matches_resample_and_specaugment(spark, fixture_rows):
    """v6 replay columns: per-clip equality against the live operators,
    raw (unrounded) doubles included."""
    from pyspark.sql import functions as F

    from wallaby2caom2_spark.operators.resample import resample_clips
    from wallaby2caom2_spark.operators.specaugment import specaugment_features

    clips_path, fix = fixture_rows
    clips = _clips_df(spark, clips_path)

    rs = resample_clips(clips).select(
        "clip_id", "rs_ok", "rs_method",
        F.length("rs_bytes").alias("len"), "dur_ms_out", "rs_rms",
    )
    for r in rs.collect():
        f = fix[r["clip_id"]]
        assert r["rs_ok"] == f["rs_ok"], r["clip_id"]
        assert r["rs_method"] == f["rs_method"], r["clip_id"]
        assert (r["len"] or 0) == f["rs_len"], r["clip_id"]
        assert r["dur_ms_out"] == f["rs_dur_out"], r["clip_id"]
        assert _norm(r["rs_rms"]) == _norm(f["rs_rms"]), r["clip_id"]

    sa = specaugment_features(clips).select(
        "clip_id", "sa_ok", "masked_cells", "masked_frac", "mean_after"
    )
    for r in sa.collect():
        f = fix[r["clip_id"]]
        assert r["sa_ok"] == f["sa_ok"], r["clip_id"]
        assert r["masked_cells"] == f["sa_masked_cells"], r["clip_id"]
        assert _norm(r["masked_frac"]) == _norm(f["sa_masked_frac"]), (
            r["clip_id"]
        )
        assert _norm(r["mean_after"]) == _norm(f["sa_mean_after"]), (
            r["clip_id"]
        )


def test_fixture_n_chars_matches_transcripts(spark, fixture_rows):
    clips_path, fix = fixture_rows
    for row in _clips_df(spark, clips_path).select(
        "clip_id", "transcript"
    ).collect():
        expect = len(row["transcript"]) if row["transcript"] is not None else 0
        assert fix[row["clip_id"]]["n_chars"] == expect


def test_fixture_lang_conf_is_float32(fixture_rows):
    """lang_conf must be stored as float32: the pipeline casts to
    FloatType, so a float64 fixture value would hash differently after the
    9-decimal rounding."""
    _, fix = fixture_rows
    some = next(iter(fix.values()))
    assert isinstance(some["lang_conf"], float)
    # widened float32 round-trips exactly through np.float32
    for f in list(fix.values())[:50]:
        assert f["lang_conf"] == float(np.float32(f["lang_conf"]))


def test_fixture_matches_onset(spark, fixture_rows):
    from wallaby2caom2_spark.operators.onset import onset_stats

    clips_path, fix = fixture_rows
    for r in onset_stats(_clips_df(spark, clips_path)).collect():
        f = fix[r["clip_id"]]
        assert r["on_ok"] == f["on_ok"], r["clip_id"]
        assert r["on_frames"] == f["on_frames"], r["clip_id"]
        assert r["on_onsets"] == f["on_onsets"], r["clip_id"]
        assert _norm(r["on_rate"]) == _norm(f["on_rate"]), r["clip_id"]
        assert _norm(r["on_flux_mean"]) == _norm(f["on_flux_mean"]), r["clip_id"]


def test_fixture_matches_declip(spark, fixture_rows):
    from wallaby2caom2_spark.operators.declip import declip_stats

    clips_path, fix = fixture_rows
    for r in declip_stats(_clips_df(spark, clips_path)).collect():
        f = fix[r["clip_id"]]
        for col in (
            "dcl_ok", "dcl_runs", "dcl_samples", "dcl_frac",
            "dcl_energy_db", "dcl_peak",
        ):
            assert _norm(r[col]) == _norm(f[col]), (r["clip_id"], col)
