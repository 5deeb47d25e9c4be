"""Snapshot checkpoint control table (S12 analog).

Reference: the state bookmark — ``config/state.yml:1-3`` persists
``last_record: <timestamp>`` and the entrypoint bootstraps it to "yesterday"
(``scripts/docker-entrypoint.sh:8-18``); each run processes the time-box
between bookmark and now (``config/config.yml:67-71``).

Here the unit of progress is a deterministic hash bucket of ``clip_id``
(operators/partitioning.with_bucket). The control file records, per run,
which buckets committed. A resumed run processes only the remainder; because
the results sink overwrites per-bucket partitions atomically, a bucket that
was mid-write during a crash is simply rewritten — exactly-once at read time.

On Iceberg this file is replaced by a control *table* holding the last
committed snapshot-id (incremental reads via
``option('start-snapshot-id', …)``); the JSON file keeps identical semantics
without the runtime jar.
"""

from __future__ import annotations

import json
import os
import tempfile


class BucketCheckpoint:
    def __init__(self, path: str, n_buckets: int):
        self.path = path
        self.n_buckets = n_buckets

    def _load_state(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            state = json.load(f)
        if state.get("n_buckets") != self.n_buckets:
            raise ValueError(
                f"checkpoint bucket count {state.get('n_buckets')} != {self.n_buckets}"
            )
        return state

    def _write_state(self, state: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)  # atomic commit, like a snapshot swap

    def load_done(self) -> set[int]:
        return set(self._load_state().get("done", []))

    def ensure_run_id(self, candidate: str) -> str:
        """The run_id is PART OF THE CHECKPOINT: lineage/metrics overwrite
        idempotently on (run_id, bucket), so a resume that minted a fresh
        id would leave the crashed attempt's rows behind under the old id
        and double-count every re-run bucket. First call records
        ``candidate``; every later call (resume) returns the recorded id,
        ignoring the candidate."""
        state = self._load_state()
        stored = state.get("run_id")
        if stored:
            return stored
        state.setdefault("n_buckets", self.n_buckets)
        state.setdefault("done", [])
        state["run_id"] = candidate
        self._write_state(state)
        return candidate

    def mark_done(self, buckets: set[int]) -> None:
        state = self._load_state()
        state["n_buckets"] = self.n_buckets
        state["done"] = sorted(set(state.get("done", [])) | set(buckets))
        self._write_state(state)

    def remaining(self) -> list[int]:
        return sorted(set(range(self.n_buckets)) - self.load_done())
