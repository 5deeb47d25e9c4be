"""Custom stateful streaming operator: cross-batch exactly-once dedup.

The reference needs no stateful stream operators (SURVEY.md §2.7), but a
training-data ingest pipeline does: upstream sources redeliver clips, and the
sink must see each ``clip_id`` once across micro-batches. Implemented with
``applyInPandasWithState`` — per-key group state holds the 64-bit hashes of
ids already emitted; redelivered rows are filtered out.

Scale notes: state is partitioned by ``pmod(xxhash64(clip_id), n_groups)``
so each state row is a bounded id-hash array (tune ``n_groups`` to bound
per-group state; at 10^12 ids the hash array per group is swapped for a
Bloom filter — same operator shape, different state payload).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [T.StructField("seen_hashes", T.ArrayType(T.LongType()))]
)

_OUT_FIELDS = [
    T.StructField("clip_id", T.StringType()),
    T.StructField("group_id", T.IntegerType()),
]
OUT_SCHEMA = T.StructType(_OUT_FIELDS)


def _hash64(s: str) -> int:
    # deterministic 63-bit FNV-1a — stable across workers and restarts
    h = 14695981039346656037
    for b in s.encode():
        h = ((h ^ b) * 1099511628211) & ((1 << 63) - 1)
    return h


def _dedup_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    fresh_ids: list[str] = []
    for pdf in pdfs:
        for cid in pdf["clip_id"]:
            h = _hash64(cid)
            if h not in seen:
                seen.add(h)
                fresh_ids.append(cid)
    state.update((sorted(seen),))
    yield pd.DataFrame({"clip_id": fresh_ids, "group_id": [key[0]] * len(fresh_ids)})


def dedup_stream(clips: DataFrame, n_groups: int = 32) -> DataFrame:
    """Streaming DataFrame of clips → first-seen clip_ids only (per run,
    persisted in the query's state store across micro-batches)."""
    keyed = clips.select("clip_id").withColumn(
        "group_id", F.pmod(F.xxhash64("clip_id"), F.lit(n_groups)).cast("int")
    )
    return keyed.groupBy("group_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
