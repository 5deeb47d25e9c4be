"""Custom stateful streaming operator: cross-batch exactly-once dedup.

The reference needs no stateful stream operators (SURVEY.md §2.7), but a
training-data ingest pipeline does: upstream sources redeliver clips, and the
sink must see each ``clip_id`` once across micro-batches. Implemented with
``applyInPandasWithState`` — per-key group state holds the 64-bit hashes of
ids already emitted; redelivered rows are filtered out.

Scale notes: state is partitioned by ``pmod(xxhash64(clip_id), n_groups)``
so each state row is a bounded id-hash array (tune ``n_groups`` to bound
per-group state; at 10^12 ids the hash array per group is swapped for a
Bloom filter — same operator shape, different state payload).  Dedup is on
the 64-bit ``xxhash64(clip_id)``, so two DISTINCT ids that collide are
treated as one (expected collisions ~n^2/2^65 — negligible at sandbox
scale, tens of thousands at 10^12 ids; widen the state to a 128-bit hash
pair, or to the ids themselves, where that loss rate is unacceptable).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
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


def _dedup_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # No per-row Python: the 64-bit id hash is computed JVM-side
    # (xxhash64 in dedup_stream); here it's pure ndarray set algebra.
    # State is a sorted int64 array — at 10^12 ids swap the array for a
    # Bloom filter payload, same operator shape.
    seen = (
        np.asarray(state.get[0], dtype=np.int64)
        if state.exists
        else np.empty(0, dtype=np.int64)
    )
    out: list[pd.Series] = []
    for pdf in pdfs:
        h = pdf["id_hash"].to_numpy(dtype=np.int64)
        first_in_batch = ~pd.Index(h).duplicated()
        fresh = first_in_batch & ~np.isin(h, seen)
        if fresh.any():
            out.append(pdf.loc[fresh, "clip_id"])
            seen = np.union1d(seen, h[fresh])  # stays sorted
    ids = pd.concat(out) if out else pd.Series([], dtype=object)
    state.update((seen.tolist(),))
    yield pd.DataFrame(
        {
            "clip_id": ids.to_numpy(),
            "group_id": np.full(len(ids), key[0], dtype=np.int32),
        }
    )


def dedup_stream(clips: DataFrame, n_groups: int = 32) -> DataFrame:
    """Streaming DataFrame of clips → first-seen clip_ids only (per run,
    persisted in the query's state store across micro-batches)."""
    keyed = clips.select(
        "clip_id",
        F.xxhash64("clip_id").alias("id_hash"),
        F.pmod(F.xxhash64("clip_id"), F.lit(n_groups)).cast("int").alias("group_id"),
    )
    return keyed.groupBy("group_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# session assembly with event-time timeout
# ---------------------------------------------------------------------------

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("clip_ids", T.ArrayType(T.StringType())),
        T.StructField("t_min_ms", T.LongType()),
        T.StructField("t_max_ms", T.LongType()),
    ]
)

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.StringType()),
        T.StructField("n_clips", T.IntegerType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
    ]
)


def session_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str | None = None
) -> DataFrame:
    """Assemble per-source recording sessions from a clip event stream:
    clips from one ``source_id`` accumulate in state until no new clip
    arrives within ``gap_minutes`` of EVENT time, then ONE assembled session
    row is emitted and the state is dropped.

    This is the full custom-stateful surface the quality-filter stream
    needs beyond dedup: ``applyInPandasWithState`` with
    ``GroupStateTimeout.EventTimeTimeout`` — the timeout fires when the
    WATERMARK (not the wall clock) passes ``last_event + gap``, so replays
    and backfills produce byte-identical sessions regardless of processing
    speed. State per key is a bounded id list + two longs; at 10^12 clips
    the id list becomes a count + rolling hash (same operator shape).
    Reference analog: the time-boxed work interval of
    ``config/config.yml:67-71`` — work is closed out by data time, not by
    arrival order.

    ``watermark`` defaults to the session gap itself: with a zero delay,
    any cross-source out-of-orderness makes the surviving-row set a
    function of micro-batch boundaries (a row older than the watermark is
    dropped BEFORE the state function sees it), which breaks the
    byte-identical-replay property this operator promises. A delay ≥ the
    reorder bound restores it; pass an explicit value to trade latency
    for tolerance.
    """
    if watermark is None:
        watermark = f"{gap_minutes} minutes"
    gap_ms = gap_minutes * 60 * 1000

    def _session_fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            clip_ids, t_min, t_max = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "source_id": [key[0]],
                    "n_clips": np.array([len(clip_ids)], dtype=np.int32),
                    "start_ms": np.array([t_min], dtype=np.int64),
                    "end_ms": np.array([t_max], dtype=np.int64),
                }
            )
            return
        clip_ids, t_min, t_max = (
            state.get if state.exists else ([], None, None)
        )
        clip_ids = list(clip_ids)
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_ms = (
                pdf["event_ts"]
                .astype("datetime64[ns]")  # pin unit: Arrow may hand back us
                .astype("int64")
                .to_numpy()
                // 1_000_000
            )
            clip_ids.extend(pdf["clip_id"].tolist())
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            t_min = lo if t_min is None else min(t_min, lo)
            t_max = hi if t_max is None else max(t_max, hi)
        if t_max is not None:
            state.update((clip_ids, t_min, t_max))
            state.setTimeoutTimestamp(t_max + gap_ms)

    return (
        events.withWatermark("event_ts", watermark)
        .groupBy("source_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

# ---------------------------------------------------------------------------
# per-source ingest quota
# ---------------------------------------------------------------------------

QUOTA_STATE_SCHEMA = T.StructType([T.StructField("n_seen", T.LongType())])

QUOTA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("source_id", T.StringType()),
        T.StructField("n_before", T.LongType()),
        T.StructField("admitted", T.BooleanType()),
    ]
)


def quota_stream(clips: DataFrame, quota: int = 3) -> DataFrame:
    """Per-source ingest quota: admit at most ``quota`` clips per source
    across ALL micro-batches, emitting an ``admitted`` decision per row —
    rows beyond the quota flow on marked ``admitted=false`` (audit trail,
    reference-style containment — never silently dropped).

    The training-data use: cap any single source's contribution so one
    crawler bug cannot flood the mixture (the streaming dual of
    ``sample_mixture_quota``). State per key is ONE long. Implemented with
    ``applyInPandasWithState``; Spark 4's ``transformWithStateInPandas``
    (typed ValueState) is the drop-in successor, but its Python driver
    worker requires ``google.protobuf``, which this container does not
    ship, so the stable API is used.

    Ordering caveat at scale: WHICH rows win the last quota slots within
    one micro-batch follows partition arrival order; if admission must be
    replay-deterministic, sort each batch by a content hash upstream (cheap
    — the quota key already co-locates the group).
    """

    def _quota_fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # state counts ROWS SEEN (not rows admitted): n_before and the
        # admit decision (n_before < quota) are then invariant to how the
        # stream is chunked into micro-batches — a replay with different
        # trigger boundaries yields byte-identical audit rows
        n = int(state.get[0]) if state.exists else 0
        for pdf in pdfs:
            k = len(pdf)
            if not k:
                continue
            pos = np.arange(n, n + k, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"].to_numpy(),
                    "source_id": np.repeat(str(key[0]), k),
                    "n_before": pos,
                    "admitted": pos < quota,
                }
            )
            n += k
        state.update((n,))

    return clips.groupBy("source_id").applyInPandasWithState(
        _quota_fn,
        outputStructType=QUOTA_OUT_SCHEMA,
        stateStructType=QUOTA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_builtin_within_watermark(
    clips: DataFrame,
    watermark: str = "2 hours",
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """Built-in alternative to ``dedup_stream``: Spark's
    ``dropDuplicatesWithinWatermark`` (3.5+) keeps per-key state only until
    the watermark passes the key's first-seen event time, then evicts — the
    right choice when redeliveries arrive within a bounded window (upstream
    at-least-once retries), because state is bounded by the watermark
    horizon instead of growing with corpus cardinality.

    ``dedup_stream`` remains the unbounded-horizon variant (its state is
    an explicit 64-bit id-hash set — exact up to hash collisions, see the
    module docstring — that the caller bounds by n_groups / swaps for a
    Bloom filter at 10^12 ids); this one trades exactness past the horizon
    for zero state-management code.  Same contract otherwise: first
    delivery wins, duplicates are dropped, not failed.
    """
    return clips.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["clip_id"]
    )
