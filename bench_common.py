"""Shared bench-harness helpers.

One definition of the steady-state warm-up so every bench's notion of
"warm" is the same heuristic with the same constants (review finding: two
hand-tuned copies of the convergence rule would silently diverge).
"""

from __future__ import annotations

import os
import statistics
import time
from typing import Callable

# keep warming while runs still improve >20%, bounded — a freshly booted
# VM stacks page-cache fill, Python-worker spin-up, and JIT of the
# codegen'd stages (measured 52s → 8s → 9s → 7s → 3.4s steady on the
# flagship); steady state is the honest estimate of an hours-long job
WARMUP_MAX_ROUNDS = 5
WARMUP_IMPROVE = 0.8


# throttle-detection gate for the timed samples themselves: this VM's
# hypervisor bursts make identical back-to-back runs vary 2-5x (guest ~90%
# idle during slow samples). A CLEAN sample set has median ≈ min; a
# median/min spread beyond THROTTLE_SPREAD is the documented throttling
# signature, so the harness keeps sampling — bounded by RESAMPLE_CAP_S of
# extra wall-clock and RESAMPLE_MAX extra samples — until the best N
# samples form a clean window. The min of more samples only improves, so
# resampling can never make the reported number worse; it makes a one-shot
# driver run robust to landing on a storm (round-3 verdict item #2).
THROTTLE_SPREAD = 2.0
RESAMPLE_CAP_S = 120.0
RESAMPLE_MAX = 12


def sample_stable(
    timed_run: Callable[[], float],
    n_runs: int,
    *,
    spread: float = THROTTLE_SPREAD,
    cap_s: float = RESAMPLE_CAP_S,
    max_extra: int = RESAMPLE_MAX,
    clock: Callable[[], float] = time.time,
) -> list[float]:
    """Collect ``n_runs`` samples from ``timed_run`` (which executes one
    run and returns its wall seconds), then — while the best ``n_runs``
    samples still look throttled (median > ``spread`` x min) — keep adding
    samples up to ``cap_s`` extra wall-clock / ``max_extra`` extra runs.
    Returns every sample taken; callers report ``min(samples)``."""
    samples = [timed_run() for _ in range(n_runs)]
    t0 = clock()
    while len(samples) < n_runs + max_extra:
        best = sorted(samples)[:n_runs]
        if statistics.median(best) <= spread * best[0]:
            break
        if clock() - t0 >= cap_s:
            break
        samples.append(timed_run())
    return samples


def host_probe(spin_s: float = 0.25) -> dict:
    """Point-in-time host-contention evidence, embedded in bench JSON so
    the artifact adjudicates itself: ``loadavg1`` with no guest process
    running means EXTERNAL (hypervisor/co-tenant) contention, and
    ``spin_mips`` — iterations of a fixed pure-Python loop per second —
    calibrates how fast this guest actually executes right now (measured
    clean-window vs contended-window runs differ ~1.7x across the whole
    suite while the code is unchanged). A reader comparing two bench
    artifacts should trust the one with the lower load and higher spin."""
    t_end = time.perf_counter() + spin_s
    n = 0
    x = 1.0
    while time.perf_counter() < t_end:
        x = x * 1.0000001 + 1e-12  # fixed float work per iteration
        n += 1
    try:
        load1 = os.getloadavg()[0]
    except OSError:  # pragma: no cover - platform without getloadavg
        load1 = -1.0
    return {
        "loadavg1": round(load1, 2),
        "spin_mips": round(n / spin_s / 1e6, 3),
    }


def adaptive_warmup(spark, run: Callable[[], None]) -> None:
    """Execute ``run`` until its wall time stops improving by >20%
    (bounded at WARMUP_MAX_ROUNDS), clearing the Spark cache between
    rounds so a persisting plan can't turn warm-up into a cache fill."""
    prev = None
    for _ in range(WARMUP_MAX_ROUNDS):
        spark.catalog.clearCache()
        t0 = time.time()
        run()
        dt = time.time() - t0
        if prev is not None and dt > WARMUP_IMPROVE * prev:
            break
        prev = dt
