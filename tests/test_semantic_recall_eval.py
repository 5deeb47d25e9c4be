"""Pytest pin for audio_semantic_recall_eval (round-4 verdict #5): plant
synthetic embeddings exhibiting each candidate-generator failure mode and
assert the report attributes every one to the right counter:

- a near-identical pair straddling hyperplane 0 → bucket miss (counts in
  true_pairs, NOT in cobucket_pairs or found_pairs);
- an identical pair separated by > SN_W filler clips inside one bucket →
  window miss (counts in cobucket_pairs, NOT found_pairs);
- an adjacent identical pair → direct hit (counts everywhere).

Constructed in the null space of the 8 LSH planes so fillers provably
share the pair's bucket without disturbing sign bits (reference pattern:
tests/test_dedup_eval.py planting eval-subset duplicates).
"""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.operators.embed import EMB_DIM
from wallaby2caom2_spark.queries.audio_embed import (
    _EVAL_MOD,
    N_PLANES,
    PLANES,
    SN_W,
    recall_eval_frame,
)


def _null_space_vec(P: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """A unit vector orthogonal to every LSH plane: adding it never flips
    a sign bit (scaled small) and never moves the plane-0 projection."""
    v = rng.standard_normal(EMB_DIM)
    # project out the planes' span
    q, _ = np.linalg.qr(P.T)
    v = v - q @ (q.T @ v)
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module")
def planted(spark):
    P = np.array(PLANES)  # (8, EMB_DIM)
    rng = np.random.default_rng(7)
    w = _null_space_vec(P, rng)

    # base vector u: comfortably inside a sign cell (all dots well away
    # from zero) so scaled copies and null-space offsets stay co-bucketed
    u = rng.standard_normal(EMB_DIM)
    d = P @ u
    u = u + P.T @ np.linalg.solve(P @ P.T, np.sign(d) * 1.0 - d)
    assert (np.abs(P @ u) > 0.5).all()

    def gated(i):  # numeric suffix ≡ 0 mod _EVAL_MOD → in the eval subset
        return f"plant_{i * _EVAL_MOD:010d}"

    def filler(i):  # suffix ≡ 1 → outside the subset
        return f"fill_{i * _EVAL_MOD + 1:010d}"

    rows = []
    # (1) boundary miss: v straddles plane 0. Build v ⊥-ish decomposition:
    # start from a vector with tiny plane-0 dot, flip its sign with an
    # epsilon nudge along plane 0 — cosine stays ≈ 1, bucket bit 0 flips.
    p0 = P[0] / np.linalg.norm(P[0])
    base = u - (u @ p0) * p0 + 5.0 * w  # plane-0 dot ≈ 0
    # pin the pair into a cell PROVABLY distinct from u's (bits 1..7
    # inverted), so it cannot coincidentally neighbor other plants
    d2 = P @ base
    tgt = -np.sign(P @ u)
    tgt[0] = 1.0
    va = base + P.T @ np.linalg.solve(P @ P.T, tgt * 0.6 - d2)
    va[np.abs(va) < 1e-12] = 0.0
    eps = P.T @ np.linalg.solve(P @ P.T, np.eye(N_PLANES)[0] * -1.2)
    vb = va + eps  # flips plane-0 dot from +0.6 to -0.6
    cos_ab = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
    assert cos_ab > 0.985, cos_ab  # still a TRUE pair
    assert np.sign(P[0] @ va) != np.sign(P[0] @ vb)  # bucket bit differs
    rows += [(gated(1), True, va.tolist()), (gated(2), True, vb.tolist())]

    # (2) window miss: u and 2.2*u (cos = 1) with > SN_W fillers whose
    # plane-0 projections interleave between them, all in u's bucket,
    # none similar enough to anything (cos vs u ≈ a/√(a²+b²) ≈ 0.9)
    rows += [(gated(3), True, u.tolist()),
             (gated(4), True, (2.2 * u).tolist())]
    for i in range(SN_W + 4):
        a = 1.05 + (i + 1) * (1.0 / (SN_W + 8))  # strictly inside (1, 2.2)
        f = a * u + (0.5 * a * np.linalg.norm(u)) * w
        assert (np.sign(P @ f) == np.sign(P @ u)).all()
        rows.append((filler(i), True, f.tolist()))

    # (3) direct hit: two adjacent near-identical clips in their own cell
    u2 = rng.standard_normal(EMB_DIM)
    d3 = P @ u2
    u2 = u2 + P.T @ np.linalg.solve(P @ P.T, np.sign(d3) * 1.0 - d3)
    v2 = u2 + 0.001 * w
    rows += [(gated(5), True, u2.tolist()), (gated(6), True, v2.tolist())]
    # an emb_ok=false row must be ignored entirely
    rows.append((gated(7), False, [0.0] * EMB_DIM))

    df = spark.createDataFrame(
        rows, "clip_id string, emb_ok boolean, emb array<double>"
    )
    return recall_eval_frame(df).collect()[0]


def test_counts_attribute_each_failure_mode(planted):
    r = planted
    assert r["n_clips_eval"] == 6  # gated(1..6); emb_ok=false excluded
    # truth: boundary pair + window pair + hit pair — fillers are outside
    # the subset, and planted cells are far apart (random cells, cos < 0.98)
    assert r["true_pairs"] == 3
    # bucket miss excluded, window + hit pairs co-bucketed
    assert r["cobucket_pairs"] == 2
    # only the adjacent pair is surfaced directly
    assert r["found_pairs"] == 1
    assert r["pair_recall"] == round(1 / 3 + 1e-9, 4)
    assert r["bucket_recall"] == round(2 / 3 + 1e-9, 4)


def test_precision_counts_only_verified_candidates(planted):
    r = planted
    # subset-restricted candidates: the hit pair, plus the window pair's
    # ends may pair with OTHER subset members only if windows reach them —
    # they cannot (fillers separate them), so candidates = the hit pair
    assert r["cand_pairs"] == 1
    assert r["precision"] == 1.0
