"""ANN recall-evaluation harness tests (operators/ann_eval.py). The
harness grades the IVF scale path, so the harness itself must be above
suspicion: probing every cell must reproduce brute force EXACTLY, recall
must be monotone in nprobe, and the generator must be partition-invariant
(a retry or different parallelism cannot change the corpus)."""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark.operators.ann_eval import (
    brute_topk,
    cluster_centers,
    generate_vectors,
    ivf_assign,
    ivf_topk,
    recall_at_k,
    train_centroids,
)

N = 20_000
N_CLUSTERS = 16
N_CELLS = 16
K = 10


def _queries(seed=9, nq=8):
    """Queries drawn near generative centers (realistic: probes resemble
    corpus members), unit-normalized."""
    centers = cluster_centers(N_CLUSTERS, seed=42)
    rng = np.random.default_rng(seed)
    sigma = 0.5 / np.sqrt(centers.shape[1])  # corpus-matched geometry
    q = centers[
        rng.integers(0, N_CLUSTERS, nq)
    ] + sigma * rng.standard_normal((nq, centers.shape[1]))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_generator_is_partition_invariant(spark):
    a = generate_vectors(spark, 5000, seed=5, n_parts=2).collect()
    b = generate_vectors(spark, 5000, seed=5, n_parts=13).collect()
    da = {r["vec_id"]: r["embedding"] for r in a}
    db = {r["vec_id"]: r["embedding"] for r in b}
    assert set(da) == set(db) == set(range(5000))
    for i in (0, 1, 4095, 4096, 4999):  # block edges included
        assert da[i] == db[i]
    # unit norm
    assert abs(float(np.linalg.norm(da[7])) - 1.0) < 1e-5


def test_full_probing_equals_brute_force_and_recall_monotone(spark):
    base = generate_vectors(spark, N, n_clusters=N_CLUSTERS, seed=42)
    base = base.persist()
    q = _queries()
    truth = brute_topk(base, q, k=K)
    assert set(truth) == set(range(len(q)))
    assert all(len(v) == K for v in truth.values())

    cents = train_centroids(base, N_CELLS, sample_rows=4000, n_total=N)
    assigned = ivf_assign(base, cents).persist()
    assert assigned.count() == N

    cell_counts = {
        r["cell"]: r["count"]
        for r in assigned.groupBy("cell").count().collect()
    }
    assert sum(cell_counts.values()) == N

    recalls = {}
    for nprobe in (1, 4, N_CELLS):
        got, scanned = ivf_topk(
            spark, assigned, q, cents, nprobe, k=K, cell_counts=cell_counts
        )
        recalls[nprobe] = recall_at_k(truth, got, k=K)
        if nprobe == N_CELLS:
            # probing every cell scans every row and IS brute force
            assert scanned == N * len(q)
            assert got == truth
        else:
            assert scanned < N * len(q)
    assert recalls[1] <= recalls[4] <= recalls[N_CELLS] == 1.0
    # clustered corpus: even nprobe=1 should find most of the true top-k
    assert recalls[1] > 0.5

    base.unpersist()
    assigned.unpersist()


def test_recall_at_k_accounting():
    truth = {0: [1, 2, 3], 1: [4, 5, 6]}
    got = {0: [1, 2, 9], 1: [7, 8, 9]}
    assert recall_at_k(truth, got, k=3) == (2 / 3 + 0) / 2
    # missing query counts as zero overlap, not an error
    assert recall_at_k(truth, {0: [1, 2, 3]}, k=3) == 0.5
