"""Shared bench-harness helpers.

One definition of the steady-state warm-up so every bench's notion of
"warm" is the same heuristic with the same constants (review finding: two
hand-tuned copies of the convergence rule would silently diverge).
"""

from __future__ import annotations

import time
from typing import Callable

# keep warming while runs still improve >20%, bounded — a freshly booted
# VM stacks page-cache fill, Python-worker spin-up, and JIT of the
# codegen'd stages (measured 52s → 8s → 9s → 7s → 3.4s steady on the
# flagship); steady state is the honest estimate of an hours-long job
WARMUP_MAX_ROUNDS = 5
WARMUP_IMPROVE = 0.8


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
