"""Measured execution metrics from the live ``AppStatusStore``.

The plan-shape tests (tests/test_plan_shapes.py) prove the byte-shuffle
contract STATICALLY — no Exchange lists a payload column. This module
proves it DYNAMICALLY: after a run, the per-stage task metrics Spark
already aggregates (input bytes, shuffle read/write bytes, spill) are read
back from the driver's status store, so "payload bytes never cross a
shuffle" becomes a measured inequality (shuffle-write ≪ scan input), and
"fits in executor memory at this SF" becomes spill == 0 — the two numbers
a 100 TB capacity plan actually needs.

Implementation note: ``spark.ui.enabled`` is false in the pinned session
(UI threads cost ~3% on tight benches), but the ``AppStatusStore`` that
backs the UI/REST API is populated by ``AppStatusListener`` regardless, so
the metrics are read via the JVM gateway — no UI, no HTTP, no event-log
files. Reference analog: the per-run observable/metrics surface
(wallaby2caom2 run_composable.py result counters), widened to physical
I/O totals.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

# StageData fields worth totalling, as (python name, JVM getter)
_FIELDS = [
    ("input_bytes", "inputBytes"),
    ("output_bytes", "outputBytes"),
    ("shuffle_write_bytes", "shuffleWriteBytes"),
    ("shuffle_read_bytes", "shuffleReadBytes"),
    ("memory_spill_bytes", "memoryBytesSpilled"),
    ("disk_spill_bytes", "diskBytesSpilled"),
    ("num_tasks", "numCompleteTasks"),
    ("num_failed_tasks", "numFailedTasks"),
]


def stage_snapshot(spark: SparkSession) -> dict[tuple[int, int], dict]:
    """(stage_id, attempt_id) → metrics dict for every stage the status
    store currently holds (COMPLETE/ACTIVE/SKIPPED/FAILED alike; SKIPPED
    stages report zero everywhere, which is exactly right for totals)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(),  # all statuses
        False,  # no task details
        False,  # no summaries
        sc._gateway.new_array(jvm.double, 0),  # no quantiles
        jvm.java.util.ArrayList(),  # all task statuses
    )
    out: dict[tuple[int, int], dict] = {}
    for i in range(stages.size()):
        s = stages.apply(i)
        rec = {name: int(getattr(s, getter)()) for name, getter in _FIELDS}
        rec["name"] = s.name()
        rec["status"] = str(s.status())
        out[(int(s.stageId()), int(s.attemptId()))] = rec
    return out


@dataclass
class StageMetricsAudit:
    """Context manager: totals the stage metrics of everything executed
    inside the ``with`` block (delta against the stages already present
    at entry).

    >>> with StageMetricsAudit(spark) as audit:
    ...     df.collect()
    >>> assert audit.totals["disk_spill_bytes"] == 0

    The store is bounded (``spark.ui.retainedStages``, default 1000) —
    fine for a single audited job; don't wrap a whole bench suite in one
    audit and expect early stages to still be retained.
    """

    spark: SparkSession
    totals: dict[str, int] = field(default_factory=dict)
    stages: list[dict] = field(default_factory=list)

    def __enter__(self) -> "StageMetricsAudit":
        self._before = set(stage_snapshot(self.spark))
        return self

    def __exit__(self, exc_type: Any, exc: Any, tb: Any) -> None:
        after = stage_snapshot(self.spark)
        new = [
            {**rec, "stage_id": sid, "attempt_id": att}
            for (sid, att), rec in sorted(after.items())
            if (sid, att) not in self._before
        ]
        self.stages = new
        self.totals = {
            name: sum(s[name] for s in new) for name, _ in _FIELDS
        }

    def summary(self, payload_bytes: int | None = None) -> dict[str, int]:
        """Totals plus, when the caller supplies the dataset's payload
        size (``sum(length(bytes))`` — a fact the caller knows; the
        store's ``input_bytes`` under-reports on local-fs vectorized
        scans, so it is NOT a reliable denominator), the contract ratio
        in permille: shuffled bytes per payload byte. The flagship's
        stays in single digits (slim feature columns only); a payload
        shuffle jumps it to ~1000."""
        t = dict(self.totals)
        if payload_bytes:
            t["shuffle_write_per_payload_permille"] = (
                1000 * t["shuffle_write_bytes"] // payload_bytes
            )
        return t
