"""Training-shard packing: assign kept clips to fixed-duration shards.

A training dataloader consumes shards of roughly equal total audio
duration (sequence packing): the curation pass must turn "N kept clips of
wildly varying length" into "M shards of ~budget seconds each",
deterministically, so a re-run (or a different engine) produces the same
shard membership.

The classic formulation — walk clips in order, accumulate duration, cut a
shard when the budget fills — is inherently sequential. The distributed
form used here is the OFFSET rule: compute each clip's global running
start offset (sum of all earlier clips' durations, in a fixed
deterministic order) and assign ``shard_id = floor(start_offset /
budget)``. Every clip whose span *starts* inside shard ``s`` belongs to
``s``; a shard's total therefore exceeds the budget by at most ONE clip's
duration (the boundary straddler) — the bounded-overflow trade every
parallel packer makes, stated in the output as ``fill_pct``.

Scale shape (the whole point): the running offset is a TWO-PASS
distributed prefix sum, not a global window —

1. within-bucket cumulative sum, parallel over ``floor(order_key /
   bucket_width)`` buckets (the bucket is a prefix of the global order, so
   bucket-major order == global order);
2. one tiny aggregation of per-bucket totals (≈ rows / bucket_width rows)
   → exclusive prefix offsets, broadcast back.

The only globally-ordered work runs over the bucket-totals table; at
10^12 rows that is ~n_partitions rows on the driver side of a broadcast,
never a single-partition sort of the corpus. Same pattern as
``queries/textstats.py sample_token_budget``.

Payloads are NOT touched here: packing decides membership on slim
(order_key, duration) rows; the shard *writer* (plans/export.py) attaches
bytes in its own join-free pass.

Reference analog: the reference walks its todo list in file order and
groups work per observation (``wallaby2caom2/composable.py:115-138``);
here the "order" is explicit and the grouping is a computed shard key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_BUDGET_MS = 60_000  # one-minute shards
DEFAULT_BUCKET_WIDTH = 256  # order keys per prefix-sum bucket


def with_running_offset(
    df: DataFrame,
    dur_col: str = "dur_ms",
    order_col: str = "order_key",
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
) -> DataFrame:
    """Append ``start_off`` — the exclusive global prefix sum of
    ``dur_col`` in ``order_col`` order — via the two-pass distributed
    prefix sum. ``order_col`` must be a unique integer key; the bucket
    ``floor(order_col / bucket_width)`` is order-preserving by
    construction."""
    d = df.withColumn("_pb", F.floor(F.col(order_col) / bucket_width))
    w_in = (
        Window.partitionBy("_pb")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "_cum_in", F.coalesce(F.sum(dur_col).over(w_in), F.lit(0))
    )
    totals = d.groupBy("_pb").agg(F.sum(dur_col).alias("_btot"))
    w_b = Window.orderBy("_pb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_boff", F.coalesce(F.sum("_btot").over(w_b), F.lit(0))
    ).select("_pb", "_boff")
    return (
        d.join(F.broadcast(offsets), "_pb")
        .withColumn("start_off", (F.col("_cum_in") + F.col("_boff")).cast("long"))
        .drop("_pb", "_cum_in")
    )


def pack_by_budget(
    df: DataFrame,
    dur_col: str = "dur_ms",
    order_col: str = "order_key",
    budget_ms: int = DEFAULT_BUDGET_MS,
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
) -> DataFrame:
    """Append ``shard_id`` (offset rule) and ``start_off`` to every row.

    Deterministic: same (rows, order_col, budget) → same assignment, on
    any engine — the DuckDB oracle replays it as one SQL window
    (queries/shards.py)."""
    d = with_running_offset(df, dur_col, order_col, bucket_width)
    return d.withColumn(
        "shard_id", F.floor(F.col("start_off") / budget_ms).cast("long")
    )


def shard_summary(
    packed: DataFrame,
    dur_col: str = "dur_ms",
    budget_ms: int = DEFAULT_BUDGET_MS,
) -> DataFrame:
    """Per-shard membership stats: one slim groupBy over (shard_id, dur).

    ``fill_pct`` > 100 is the bounded straddler overflow (at most one
    clip's duration past the budget — asserted in tests/test_packing.py).
    """
    return (
        packed.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_clips"),
            F.sum(dur_col).cast("long").alias("total_ms"),
        )
        .withColumn(
            "fill_pct",
            F.round(F.col("total_ms") * 100.0 / budget_ms, 4),
        )
        .orderBy("shard_id")
    )
