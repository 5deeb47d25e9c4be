"""Unit tests for the shared bench-harness rules (no Spark needed).

The resampling gate is the round-3 fix for the driver's one-shot bench
landing on a hypervisor storm and recording a phantom 2.65x regression:
a sample set whose median/min spread shows the throttling signature keeps
sampling (bounded) until a clean window appears.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench_common import sample_stable  # noqa: E402


def _scripted(seq):
    """timed_run stub yielding a scripted duration sequence; also advances
    the fake clock by each duration so the wall-clock cap is honest."""
    it = iter(seq)
    clock = {"t": 0.0}

    def timed_run() -> float:
        dt = next(it)
        clock["t"] += dt
        return dt

    return timed_run, (lambda: clock["t"])


def test_clean_samples_stop_immediately():
    run, clock = _scripted([3.0, 3.1, 3.2, 99.0])
    got = sample_stable(run, 3, clock=clock)
    assert got == [3.0, 3.1, 3.2]  # never touched the 4th


def test_throttled_set_resamples_until_clean_window():
    # first three samples carry the throttling signature (median 8.6 vs
    # min 3.2 > 2x); one more clean sample gives a best-3 window of
    # (2.9, 3.2, 8.6) whose median 3.2 is within 2x of its min → stop
    run, clock = _scripted([3.2, 8.6, 9.1, 2.9, 3.3, 3.0, 3.0])
    got = sample_stable(run, 3, clock=clock)
    assert got == [3.2, 8.6, 9.1, 2.9]
    assert min(got) == 2.9


def test_sustained_storm_bounded_by_max_extra():
    # every sample throttled alike except one fast outlier: min/median
    # never converges, so the gate must give up at n_runs + max_extra
    run, clock = _scripted([1.0] + [10.0] * 50)
    got = sample_stable(run, 3, max_extra=4, cap_s=1e9, clock=clock)
    assert len(got) == 3 + 4


def test_sustained_storm_bounded_by_wall_clock_cap():
    run, clock = _scripted([1.0] + [30.0] * 50)
    got = sample_stable(run, 3, max_extra=50, cap_s=45.0, clock=clock)
    # cap starts after the initial n_runs: 30+30 = 60 ≥ 45 → at most two
    # extra samples
    assert len(got) <= 5


def test_min_only_improves_with_resampling():
    run, clock = _scripted([5.0, 11.0, 12.0, 4.0, 4.2, 4.1])
    got = sample_stable(run, 3, clock=clock)
    assert min(got) <= 5.0


def test_single_run_mode_needs_no_median():
    run, clock = _scripted([3.0])
    assert sample_stable(run, 1, clock=clock) == [3.0]


def test_host_probe_shape_and_sanity():
    from bench_common import host_probe

    p = host_probe(spin_s=0.05)
    assert set(p) == {"loadavg1", "spin_mips"}
    assert p["spin_mips"] > 0.1  # any functioning CPU spins >100k iter/s
    assert p["loadavg1"] >= -1.0
