"""One-pass distributed OLS (audio_ols_speech_model): exact agreement with
a serial numpy replay of the same normal-equations solve, and a model-
quality floor (speech frames genuinely track total frames)."""

from __future__ import annotations

import glob

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _fixture_xy():
    from wallaby2caom2_spark.queries.clips_flagship import features_path_for

    parts = sorted(glob.glob(f"{features_path_for(SF)}/*.parquet"))
    cols = {"vad_ok": [], "n_frames": [], "n_chars": [], "n_speech_frames": []}
    for p in parts:
        t = pq.read_table(p, columns=list(cols))
        for k in cols:
            cols[k].extend(t.column(k).to_pylist())
    ok = np.array(cols["vad_ok"], dtype=bool)
    x1 = np.array(cols["n_frames"], dtype=np.int64)[ok]
    x2 = np.array(cols["n_chars"], dtype=np.int64)[ok]
    y = np.array(cols["n_speech_frames"], dtype=np.int64)[ok]
    return x1, x2, y


def _cramer_solve(x1, x2, y):
    """The query's EXACT arithmetic: integer sufficient statistics, then the
    identical double-precision Cramer expressions."""
    n = int(len(y))
    sx1, sx2, sy = int(x1.sum()), int(x2.sum()), int(y.sum())
    sx11, sx12, sx22 = int((x1 * x1).sum()), int((x1 * x2).sum()), int((x2 * x2).sum())
    sx1y, sx2y, syy = int((x1 * y).sum()), int((x2 * y).sum()), int((y * y).sum())
    f = float
    det = (
        n * (f(sx11) * f(sx22) - f(sx12) * f(sx12))
        - f(sx1) * (f(sx1) * f(sx22) - f(sx12) * f(sx2))
        + f(sx2) * (f(sx1) * f(sx12) - f(sx11) * f(sx2))
    )
    det0 = (
        f(sy) * (f(sx11) * f(sx22) - f(sx12) * f(sx12))
        - f(sx1) * (f(sx1y) * f(sx22) - f(sx12) * f(sx2y))
        + f(sx2) * (f(sx1y) * f(sx12) - f(sx11) * f(sx2y))
    )
    det1 = (
        n * (f(sx1y) * f(sx22) - f(sx12) * f(sx2y))
        - f(sy) * (f(sx1) * f(sx22) - f(sx12) * f(sx2))
        + f(sx2) * (f(sx1) * f(sx2y) - f(sx1y) * f(sx2))
    )
    det2 = (
        n * (f(sx11) * f(sx2y) - f(sx1y) * f(sx12))
        - f(sx1) * (f(sx1) * f(sx2y) - f(sx1y) * f(sx2))
        + f(sy) * (f(sx1) * f(sx12) - f(sx11) * f(sx2))
    )
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    sse = f(syy) - b0 * f(sy) - b1 * f(sx1y) - b2 * f(sx2y)
    sst = f(syy) - f(sy) * f(sy) / n
    return n, b0, b1, b2, 1.0 - sse / sst


def test_query_matches_serial_cramer_replay(spark):
    from wallaby2caom2_spark.queries.clips_flagship import audio_ols_speech_model

    [row] = audio_ols_speech_model(spark, SF).collect()
    n, b0, b1, b2, r2 = _cramer_solve(*_fixture_xy())
    assert row["n_clips"] == n
    assert row["b_intercept"] == round(b0 + 1e-9, 6)
    assert row["b_frames"] == round(b1 + 1e-9, 6)
    assert row["b_chars"] == round(b2 + 1e-9, 6)
    assert row["r2"] == round(r2 + 1e-9, 6)


def test_model_actually_learns(spark):
    """Speech frames track total frames with a positive slope and the fit
    explains a substantial share of the variance — the one-pass solve is a
    real model fit, not a degenerate identity."""
    from wallaby2caom2_spark.queries.clips_flagship import audio_ols_speech_model

    [row] = audio_ols_speech_model(spark, SF).collect()
    assert row["n_clips"] > 500
    assert row["b_frames"] > 0.0
    assert 0.2 < row["r2"] <= 1.0


def test_ols_against_numpy_lstsq():
    """The Cramer solve agrees with np.linalg.lstsq on the same design
    matrix to numerical tolerance — the closed form is the right answer,
    not just a deterministic one."""
    x1, x2, y = _fixture_xy()
    _, b0, b1, b2, _ = _cramer_solve(x1, x2, y)
    A = np.stack([np.ones_like(x1), x1, x2], axis=1).astype(np.float64)
    ref, *_ = np.linalg.lstsq(A, y.astype(np.float64), rcond=None)
    assert np.allclose([b0, b1, b2], ref, rtol=1e-6, atol=1e-6)
