"""Shard packing (operators/packing.py): offset rule vs a serial
reference, bucket-width invariance of the distributed prefix sum, and the
bounded-straddler overflow contract."""

from __future__ import annotations

import numpy as np
import pytest

from wallaby2caom2_spark.operators import packing

BUDGET = 10_000


def _df(spark, keys, durs):
    return spark.createDataFrame(
        [(int(k), int(d)) for k, d in zip(keys, durs)],
        "order_key long, dur_ms long",
    )


@pytest.fixture(scope="module")
def sample():
    rng = np.random.default_rng(7)
    keys = rng.permutation(5_000)[:1_200]  # sparse, shuffled arrival order
    durs = rng.integers(200, 3_000, size=len(keys))
    return keys, durs


def _serial_shards(keys, durs, budget):
    """The sequential definition the distributed form must reproduce:
    walk clips in key order, each clip's shard is floor(start/budget)."""
    order = np.argsort(keys)
    out = {}
    off = 0
    for i in order:
        out[int(keys[i])] = off // budget
        off += int(durs[i])
    return out


def test_offset_rule_matches_serial_reference(spark, sample):
    keys, durs = sample
    got = {
        r["order_key"]: r["shard_id"]
        for r in packing.pack_by_budget(
            _df(spark, keys, durs), budget_ms=BUDGET, bucket_width=7
        ).collect()
    }
    assert got == _serial_shards(keys, durs, BUDGET)


def test_bucket_width_invariance(spark, sample):
    """The prefix-sum bucketing is an execution detail: any width gives the
    identical assignment (width 10**6 degenerates to one bucket — the
    naive global window — so the two-pass form is proven against it)."""
    keys, durs = sample
    frames = [
        packing.pack_by_budget(
            _df(spark, keys, durs), budget_ms=BUDGET, bucket_width=w
        )
        for w in (3, 256, 10**6)
    ]
    results = [
        sorted((r["order_key"], r["shard_id"]) for r in f.collect())
        for f in frames
    ]
    assert results[0] == results[1] == results[2]


def test_straddler_bound_and_fill(spark, sample):
    """Shard totals exceed the budget by at most ONE clip's duration, and
    every shard except possibly the last is at least full enough that the
    NEXT clip started beyond it (i.e. non-last shards reach the budget)."""
    keys, durs = sample
    packed = packing.pack_by_budget(
        _df(spark, keys, durs), budget_ms=BUDGET, bucket_width=64
    )
    summary = packing.shard_summary(packed, budget_ms=BUDGET).collect()
    max_dur = int(max(durs))
    shard_ids = [r["shard_id"] for r in summary]
    assert shard_ids == sorted(shard_ids)
    assert shard_ids == list(range(len(shard_ids)))  # no empty shard gaps
    for r in summary:
        assert r["total_ms"] <= BUDGET + max_dur, r
        assert r["fill_pct"] == round(r["total_ms"] * 100.0 / BUDGET, 4)
    # every non-final shard spans its full budget window: the straddler
    # that STARTS inside it ends past the boundary or the next clip starts
    # exactly there — so cumulative duration through shard s reaches
    # (s+1)*budget for all but the last shard
    cum = 0
    for r in summary[:-1]:
        cum += r["total_ms"]
        assert cum >= (r["shard_id"] + 1) * BUDGET, r


def test_empty_input(spark):
    packed = packing.pack_by_budget(_df(spark, [], []), budget_ms=BUDGET)
    assert packed.count() == 0
    assert packing.shard_summary(packed, budget_ms=BUDGET).count() == 0


def test_offset_window_is_bucket_partitioned(spark, sample):
    """Plan pin: the corpus-sized window runs PARTITIONED by the prefix-sum
    bucket; the only unpartitioned (single-partition) window consumes the
    tiny bucket-totals aggregate — never corpus rows."""
    keys, durs = sample
    packed = packing.pack_by_budget(
        _df(spark, keys, durs), budget_ms=BUDGET, bucket_width=64
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        packed.explain("formatted")
    plan = buf.getvalue()
    # two Window nodes: the within-bucket cumsum and the offsets window
    assert plan.count("Window (") == 2, plan
    # every Window detail block either partitions by the prefix-sum bucket
    # (corpus side) or consumes only the bucket-totals aggregate (_btot) —
    # an unpartitioned window over corpus rows (dur_ms in its input) would
    # be the single-partition global-cumsum trap
    for block in plan.split("\n\n"):
        if not block.strip().startswith("("):
            continue
        head = block.strip().splitlines()[0]
        if "Window" not in head:
            continue
        partitioned = "partitionspec" in block.lower() or "_pb" in block
        inp = next(
            (l for l in block.splitlines() if l.startswith("Input")), ""
        )
        if "dur_ms" in inp:
            assert "_pb" in block, block  # corpus window must be bucketed
        else:
            assert "_btot" in inp or "_btot" in block, block
