"""SpecAugment masking (operators/specaugment.py).

Pins mask determinism (content-seeded — batch order and retries cannot
change a tensor), feature-math identity with operators/features.py,
mask-fill semantics (every cell is either the original value or the
matrix mean), and the geometry bounds of the mask policy.
"""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark.operators.specaugment import (
    MAX_FREQ_MASK,
    MAX_TIME_MASK,
    N_FREQ_MASKS,
    N_TIME_MASKS,
    mask_spans,
    specaug_seed,
    specaugment_clip,
    specaugment_features,
)


def _feats(n_frames=50, n_bands=12, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(-3.0, 1.0, (n_frames, n_bands)).astype(np.float32)


def test_mask_is_deterministic_per_clip():
    f = _feats()
    a, na = specaugment_clip(f, "clip-001")
    b, nb = specaugment_clip(f, "clip-001")
    assert na == nb and np.array_equal(a, b)


def test_different_clips_get_different_masks():
    f = _feats()
    a, _ = specaugment_clip(f, "clip-001")
    b, _ = specaugment_clip(f, "clip-002")
    assert not np.array_equal(a, b)


def test_seed_domain_separated_from_noise_mix():
    from wallaby2caom2_spark.operators.augment import _clip_seed

    assert specaug_seed("clip-001") != _clip_seed("clip-001")


def test_masked_cells_are_fill_value_others_untouched():
    f = _feats()
    fill = np.float32(f.mean())
    masked, n_cells = specaugment_clip(f, "clip-xyz")
    diff = masked != f
    assert int(diff.sum()) <= n_cells  # cells already == fill count as masked
    assert np.all(masked[diff] == fill)
    assert np.array_equal(masked[~diff], f[~diff])


def test_mask_geometry_bounds():
    rng = np.random.default_rng(42)
    for n, max_w, k in ((50, MAX_TIME_MASK, N_TIME_MASKS),
                        (12, MAX_FREQ_MASK, N_FREQ_MASKS),
                        (3, 10, 2)):  # max_width > n: clamps to n
        spans = mask_spans(rng, n, max_w, k)
        assert len(spans) == k
        for s, w in spans:
            assert 0 <= w <= min(max_w, n)
            assert 0 <= s and s + w <= n


def test_input_never_mutated():
    f = _feats()
    before = f.copy()
    specaugment_clip(f, "clip-001")
    assert np.array_equal(f, before)


def test_operator_matches_feature_frames_outside_masks(spark, tmp_path):
    """Feature-math identity: the unmasked cells of the SpecAugment tensor
    must equal operators/features.py's tensor bit-for-bit, and the masked
    tensor must equal a local replay of specaugment_clip on it."""
    from wallaby2caom2_spark import datagen
    from wallaby2caom2_spark.operators.features import feature_frames

    path = str(tmp_path / "clips")
    datagen.write_clips_parquet(path, 80, seed=11, rows_per_file=40)
    df = spark.read.parquet(path)

    feats = {
        r["clip_id"]: r
        for r in feature_frames(df).collect()
        if r["feat_ok"]
    }
    got = {r["clip_id"]: r for r in specaugment_features(df).collect()}
    assert set(got) >= set(feats)
    n_checked = 0
    for cid, fr in feats.items():
        g = got[cid]
        assert g["sa_ok"]
        base = np.frombuffer(bytes(fr["feat_bytes"]), dtype=np.float32).reshape(
            fr["n_frames"], fr["n_bands"]
        )
        expect, n_cells = specaugment_clip(base, cid)
        assert g["masked_cells"] == n_cells
        assert np.array_equal(
            np.frombuffer(bytes(g["sa_bytes"]), dtype=np.float32).reshape(
                g["n_frames"], g["n_bands"]
            ),
            expect,
        )
        assert g["mean_before"] == float(base.mean())
        n_checked += 1
    assert n_checked > 10  # non-vacuous

    # containment rows mirror the features operator
    for cid, g in got.items():
        if cid not in feats:
            assert not g["sa_ok"] and g["sa_bytes"] is None


def test_operator_plan_is_single_stage_no_shuffle(spark, tmp_path):
    from wallaby2caom2_spark import datagen

    path = str(tmp_path / "clips")
    datagen.write_clips_parquet(path, 40, seed=5, rows_per_file=40)
    plan = specaugment_features(
        spark.read.parquet(path)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1
