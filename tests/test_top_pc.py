"""Power-iteration top PC (queries/similarity.py embedding_top_pc):
recovers a planted dominant direction, returns a unit vector, and reports
a variance share that tracks the planted anisotropy."""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.queries.similarity import DIM, embedding_top_pc


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    rng = np.random.RandomState(7)
    u = np.zeros(DIM)
    u[3], u[17], u[40] = 0.6, 0.64, 0.48  # unit planted direction
    n = 400
    # strong 1-D signal along u + weak isotropic noise
    x = np.outer(rng.randn(n) * 5.0, u) + rng.randn(n, DIM) * 0.3
    rows = [
        (int(i), [float(v) for v in x[i]], int(i % 3)) for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path_factory.mktemp("toppc"))
    df.write.parquet(f"{d}/embeddings.parquet")
    return d


def test_recovers_planted_direction(spark, planted_dir):
    rows = embedding_top_pc(spark, planted_dir).collect()
    assert len(rows) == DIM
    load = np.zeros(DIM)
    for r in rows:
        load[r["dim"]] = r["loading"]
    u = np.zeros(DIM)
    u[3], u[17], u[40] = 0.6, 0.64, 0.48
    cos = abs(float(load @ u) / (np.linalg.norm(load) * np.linalg.norm(u)))
    assert cos > 0.99
    # unit vector
    assert np.linalg.norm(load) == pytest.approx(1.0, abs=1e-4)


def test_variance_share_tracks_anisotropy(spark, planted_dir):
    rows = embedding_top_pc(spark, planted_dir).collect()
    var_share = rows[0]["var_share"]
    lam = rows[0]["lam"]
    # planted: signal var ~25 along u vs noise var ~0.09 per remaining dim
    # → top PC should carry well over half the total variance
    assert var_share > 0.5
    assert lam > 1.0
    # the summary scalars are constant across the 64 dim rows
    assert all(r["var_share"] == var_share and r["lam"] == lam for r in rows)
