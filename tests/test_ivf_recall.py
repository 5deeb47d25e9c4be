"""IVF recall eval (queries/similarity.py::ann_ivf_recall_eval): a probe
whose true neighbors live in its own inverted list scores 1.0; a probe
whose true neighbors sit across the centroid boundary loses them all —
the nprobe=1 cost made exact."""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark.queries.similarity import (
    N_CENTROIDS,
    TOP_K,
    ann_ivf_recall_eval,
)

DIM = 8


def _unit(i: int) -> list[float]:
    v = [0.0] * DIM
    v[i] = 1.0
    return v


def _mix(a: float, b: float) -> list[float]:
    v = [0.0] * DIM
    v[0], v[1] = a, b
    n = float(np.hypot(a, b))
    return [x / n for x in v]


def test_boundary_probe_loses_cross_list_neighbors(spark, tmp_path):
    rows = []
    # centroids: ids 0..7 = the 8 unit axes
    for i in range(N_CENTROIDS):
        rows.append((i, "c", _unit(i)))
    # in-list probe 101 → axis-0 cluster with 6 close friends (ids 8..13)
    rows.append((101, "p", _mix(1.0, 0.05)))
    for j in range(6):
        rows.append((8 + j, "d", _mix(1.0, 0.06 + 0.01 * j)))
    # boundary probe 202: barely on the axis-0 side...
    rows.append((202, "p", _mix(0.72, 0.70)))
    # ...but its 5 TRUE nearest neighbors are barely on the axis-1 side
    for j in range(TOP_K):
        rows.append((20 + j, "d", _mix(0.70, 0.72 + 0.01 * j)))
    # distractors deep in axis-1 territory (so list B is non-trivial)
    for j in range(3):
        rows.append((40 + j, "d", _mix(0.05, 1.0)))
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    d = str(tmp_path / "emb")
    df.write.parquet(f"{d}/embeddings.parquet")
    r = ann_ivf_recall_eval(spark, d).collect()[0]
    assert r["n_probes"] == 2
    assert r["k"] == TOP_K
    # probe 101: all true neighbors in-list → perfect; probe 202: all
    # true neighbors across the boundary → zero
    assert r["n_perfect"] == 1
    assert r["min_recall"] == 0.0
    assert r["avg_recall"] == 0.5
