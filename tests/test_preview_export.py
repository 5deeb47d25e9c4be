"""Preview artifact sink (round-3 verdict #8): PNG files on disk must
match the preview columns byte-for-byte, carry the reference-style names,
and obey the same stale-guard + idempotence contract as the shard sinks."""

from __future__ import annotations

import json
import os

import pytest

from wallaby2caom2_spark import datagen
from wallaby2caom2_spark.operators import preview as preview_op
from wallaby2caom2_spark.plans.export import export_preview_artifacts
from wallaby2caom2_spark.sources.clips import read_clips

N_CLIPS = 120
N_BUCKETS = 4


@pytest.fixture(scope="module")
def small_clips(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("prevclips") / "clips")
    datagen.write_clips_parquet(path, N_CLIPS, seed=7)
    return path


def test_waveform_artifacts_match_column_bytes(spark, small_clips, tmp_path):
    out = str(tmp_path / "out")
    manifest = export_preview_artifacts(
        spark, small_clips, out, n_buckets=N_BUCKETS, flavor="waveform"
    )

    expected = {
        r["thumb_name"]: bytes(r["thumb_png"])
        for r in preview_op.with_previews(read_clips(spark, small_clips))
        .filter("prev_ok")
        .collect()
    }
    assert manifest["n_previews"] == len(expected) > 0

    on_disk = {}
    art_dir = os.path.join(out, "previews-waveform")
    for bdir in os.listdir(art_dir):
        if not bdir.startswith("bucket="):
            continue  # manifest.json lives alongside the bucket dirs
        for name in os.listdir(os.path.join(art_dir, bdir)):
            with open(os.path.join(art_dir, bdir, name), "rb") as fh:
                on_disk[name] = fh.read()

    assert set(on_disk) == set(expected)
    for name, data in expected.items():
        assert name.endswith("_prev_256.png")
        assert on_disk[name] == data, name
        assert data[:8] == b"\x89PNG\r\n\x1a\n", name

    # manifest on disk equals the returned dict and the real counts
    with open(os.path.join(art_dir, "manifest.json")) as fh:
        persisted = json.load(fh)
    assert persisted == manifest
    assert sum(b["n_files"] for b in manifest["buckets"].values()) == len(
        expected
    )
    assert sum(b["n_bytes"] for b in manifest["buckets"].values()) == sum(
        len(d) for d in expected.values()
    )


def test_spectrogram_flavor_names(spark, small_clips, tmp_path):
    out = str(tmp_path / "out_spec")
    manifest = export_preview_artifacts(
        spark, small_clips, out, n_buckets=2, flavor="spectrogram"
    )
    assert manifest["flavor"] == "spectrogram"
    art_dir = os.path.join(out, "previews-spectrogram")
    names = [
        n
        for bdir in os.listdir(art_dir)
        if bdir.startswith("bucket=")
        for n in os.listdir(os.path.join(art_dir, bdir))
    ]
    assert names and all(n.endswith("_spec_256.png") for n in names)


def test_rerun_is_idempotent(spark, small_clips, tmp_path):
    out = str(tmp_path / "out_idem")
    m1 = export_preview_artifacts(spark, small_clips, out, n_buckets=N_BUCKETS)
    m2 = export_preview_artifacts(spark, small_clips, out, n_buckets=N_BUCKETS)
    assert m1 == m2


def test_stale_bucket_guard(spark, small_clips, tmp_path):
    out = str(tmp_path / "out_stale")
    export_preview_artifacts(spark, small_clips, out, n_buckets=N_BUCKETS)
    foreign = os.path.join(out, "previews-waveform", "bucket=99")
    os.makedirs(foreign)
    with open(os.path.join(foreign, "alien_prev_256.png"), "wb") as fh:
        fh.write(b"\x89PNGjunk")
    with pytest.raises(ValueError, match="stale buckets \\[99\\]"):
        export_preview_artifacts(
            spark, small_clips, out, n_buckets=N_BUCKETS
        )


def test_unknown_flavor_rejected(spark, small_clips, tmp_path):
    with pytest.raises(ValueError, match="flavor"):
        export_preview_artifacts(
            spark, small_clips, str(tmp_path / "x"), flavor="oscilloscope"
        )


def test_both_flavors_coexist_in_one_out_path(spark, small_clips, tmp_path):
    """Round-4 advice: the two flavors are independent artifact sets —
    exporting both into one out_path must leave two self-describing
    dirs, each with its own manifest, neither guard tripping."""
    out = str(tmp_path / "out_both")
    m_wave = export_preview_artifacts(
        spark, small_clips, out, n_buckets=2, flavor="waveform"
    )
    m_spec = export_preview_artifacts(
        spark, small_clips, out, n_buckets=2, flavor="spectrogram"
    )
    for flavor, m in (("waveform", m_wave), ("spectrogram", m_spec)):
        art_dir = os.path.join(out, f"previews-{flavor}")
        with open(os.path.join(art_dir, "manifest.json")) as fh:
            persisted = json.load(fh)
        assert persisted == m
        assert persisted["flavor"] == flavor
        # every file in the dir matches the flavor's naming scheme
        suffix = "_prev_256.png" if flavor == "waveform" else "_spec_256.png"
        names = [
            n
            for bdir in os.listdir(art_dir)
            if bdir.startswith("bucket=")
            for n in os.listdir(os.path.join(art_dir, bdir))
        ]
        assert names and all(n.endswith(suffix) for n in names)
