"""Pytest pin for the multi-table (OR-amplified) semantic-neardup chain
(round-5: the measured hyperplane-boundary miss — bucket_recall 0.544 at
sf0.01 with one 8-plane table — gets N_TABLES independent tables whose
candidate sets union).

Deterministic end to end: the planted geometry reuses
test_semantic_recall_eval's fixture construction (seeded rng, md5-derived
planes), so every counter below is a constant of the code, not a
statistical expectation. The load-bearing claims:

- the single-table BOUNDARY-MISS pair (straddles table 0's plane 0) is
  RESCUED by the union — some other table co-buckets it, which is the
  entire point of OR-amplification;
- the union candidate set is a superset of table 0's (monotonicity);
- the window miss is ALSO rescued: filler interleaving is an artifact
  of table 0's projection order, and another table ranks the pair
  within the window.
"""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.operators.embed import EMB_DIM
from wallaby2caom2_spark.queries.audio_embed import (
    _EVAL_MOD,
    N_PLANES,
    N_TABLES,
    PLANES,
    SN_W,
    TABLE_PLANES,
    recall_eval_frame,
    recall_eval_frame_mt,
)


def _planted_rows():
    """The exact planted geometry of test_semantic_recall_eval (same
    seed, same construction) — three true pairs: a table-0 boundary
    miss, a window miss, a direct hit."""
    P = np.array(PLANES)
    rng = np.random.default_rng(7)
    v = rng.standard_normal(EMB_DIM)
    q, _ = np.linalg.qr(P.T)
    v = v - q @ (q.T @ v)
    w = v / np.linalg.norm(v)

    u = rng.standard_normal(EMB_DIM)
    d = P @ u
    u = u + P.T @ np.linalg.solve(P @ P.T, np.sign(d) * 1.0 - d)

    def gated(i):
        return f"plant_{i * _EVAL_MOD:010d}"

    def filler(i):
        return f"fill_{i * _EVAL_MOD + 1:010d}"

    rows = []
    p0 = P[0] / np.linalg.norm(P[0])
    base = u - (u @ p0) * p0 + 5.0 * w
    d2 = P @ base
    tgt = -np.sign(P @ u)
    tgt[0] = 1.0
    va = base + P.T @ np.linalg.solve(P @ P.T, tgt * 0.6 - d2)
    va[np.abs(va) < 1e-12] = 0.0
    eps = P.T @ np.linalg.solve(P @ P.T, np.eye(N_PLANES)[0] * -1.2)
    vb = va + eps
    assert np.sign(P[0] @ va) != np.sign(P[0] @ vb)
    rows += [(gated(1), True, va.tolist()), (gated(2), True, vb.tolist())]

    rows += [(gated(3), True, u.tolist()),
             (gated(4), True, (2.2 * u).tolist())]
    for i in range(SN_W + 4):
        a = 1.05 + (i + 1) * (1.0 / (SN_W + 8))
        f = a * u + (0.5 * a * np.linalg.norm(u)) * w
        rows.append((filler(i), True, f.tolist()))

    u2 = rng.standard_normal(EMB_DIM)
    d3 = P @ u2
    u2 = u2 + P.T @ np.linalg.solve(P @ P.T, np.sign(d3) * 1.0 - d3)
    v2 = u2 + 0.001 * w
    rows += [(gated(5), True, u2.tolist()), (gated(6), True, v2.tolist())]
    rows.append((gated(7), False, [0.0] * EMB_DIM))
    return rows, va, vb


@pytest.fixture(scope="module")
def frames(spark):
    rows, va, vb = _planted_rows()
    df = spark.createDataFrame(
        rows, "clip_id string, emb_ok boolean, emb array<double>"
    )
    single = recall_eval_frame(df).collect()[0]
    multi = recall_eval_frame_mt(df).collect()[0]
    return single, multi, va, vb


def test_boundary_miss_rescued_by_another_table(frames):
    single, multi, va, vb = frames
    # prerequisite (from the single-table pin): table 0 splits the pair
    assert single["cobucket_pairs"] == 2
    # at least one other table co-buckets it — verify against the plane
    # constants directly, then against the engine's counter
    rescued = any(
        (
            np.sign(np.array(TABLE_PLANES[t]) @ np.array(va))
            == np.sign(np.array(TABLE_PLANES[t]) @ np.array(vb))
        ).all()
        for t in range(1, N_TABLES)
    )
    assert rescued  # deterministic constants; if this trips, planes changed
    assert multi["cobucket_pairs"] == 3
    assert multi["bucket_recall"] == 1.0


def test_union_counters_are_monotone_vs_single_table(frames):
    single, multi, _va, _vb = frames
    assert multi["true_pairs"] == single["true_pairs"] == 3
    assert multi["cand_pairs"] >= single["cand_pairs"]
    assert multi["found_pairs"] >= single["found_pairs"]
    assert multi["cobucket_pairs"] >= single["cobucket_pairs"]


def test_union_rescues_window_miss_via_reordering(frames):
    single, multi, _va, _vb = frames
    # single-table: the far pair (u vs 2.2u) is co-bucketed but > SN_W
    # fillers interleave along TABLE 0's plane-0 projection, so it is a
    # window miss there (the single-table pin asserts found_pairs == 1).
    # The union rescues it too: the fillers' interleaving is an artifact
    # of table 0's ordering — another table's plane-0 ranks the pair
    # within SN_W. Multi-table OR therefore lifts BOTH failure modes on
    # this fixture: all three true pairs surface directly.
    assert single["found_pairs"] == 1
    assert multi["found_pairs"] == 3
    assert multi["pair_recall"] == 1.0


def test_mt_is_deterministic(spark, frames):
    rows, _va, _vb = _planted_rows()
    df = spark.createDataFrame(
        rows, "clip_id string, emb_ok boolean, emb array<double>"
    )
    again = recall_eval_frame_mt(df).collect()[0]
    assert again == frames[1]
