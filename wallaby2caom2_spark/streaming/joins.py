"""Watermarked stream-stream interval join (event-time attribution).

The reference's incremental runs only ever correlate a work stream with
STATIC lookup tables (reject lists, retry lists — SURVEY.md §2.3); a
training-data ingest pipeline also needs the two-moving-sides case: e.g.
clip-arrival events joined to transcript-correction events that land
minutes later.  Structured Streaming supports this as an interval join —
both sides watermarked, the join condition bounding the event-time gap —
so state for rows older than (watermark + interval) is evicted and the
join runs forever on bounded memory.

On batch inputs the same expression degrades to a plain conditional join
(watermarks are no-ops), which is what the equivalence test pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_attribution_join(
    base: DataFrame,
    follow: DataFrame,
    key: str = "user_id",
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Pair every ``follow`` row with the ``base`` rows of the same ``key``
    it follows within ``(0, max_lag]`` event time.

    Both sides carry a watermark: Spark derives the state-retention bound
    from watermark + the interval condition, so neither side's join state
    grows unboundedly (the 10^12-row requirement — an unwatermarked
    stream-stream join buffers EVERYTHING).  Inner join: late rows beyond
    the watermark drop deterministically on both sides.
    """
    b = (
        base.select(
            F.col(key).alias("b_key"),
            F.col("ts").cast("timestamp").alias("b_ts"),
            F.col("event_id").alias("base_event"),
        ).withWatermark("b_ts", watermark)
    )
    f = (
        follow.select(
            F.col(key).alias("f_key"),
            F.col("ts").cast("timestamp").alias("f_ts"),
            F.col("event_id").alias("follow_event"),
        ).withWatermark("f_ts", watermark)
    )
    cond = (
        (b["b_key"] == f["f_key"])
        & (f["f_ts"] > b["b_ts"])
        & (f["f_ts"] <= b["b_ts"] + F.expr(f"INTERVAL {max_lag}"))
    )
    return b.join(f, cond, "inner").select(
        F.col("b_key").alias(key),
        "base_event",
        "follow_event",
        "b_ts",
        "f_ts",
    )
