"""Event-time windowed aggregation with watermark (late-data handling).

The reference has no stream windows (SURVEY.md §2.5/§2.7: time-boxing is
work-chunking, not event-time) — this module adds the streaming rollup a
training-data ingest pipeline needs: tumbling event-time windows with a
watermark bounding state, so late events inside the watermark still land in
their window and older ones are dropped deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..colexpr import cents


def windowed_rollup(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(streaming or batch) events(ts, event_type, value) → per-window counts.

    On a streaming input the watermark bounds aggregation state: state for
    windows older than max(event ts) - watermark is finalized and evicted.
    On a batch input the same expression degrades to a plain groupBy.
    """
    return (
        # parquet TIMESTAMP_NTZ is not a valid event-time type; normalize
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # shared exact-money rule (colexpr.cents): per-row round BEFORE
            # the sum keeps the total independent of merge order
            F.sum(cents(F.col("value"))).alias("sum_value_cents"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_cents",
        )
    )
