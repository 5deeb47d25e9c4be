"""Explicit partitioning / skew control (north rule).

The generator plants hot clip_id prefixes (datagen.py ``hot_*``); at 10^12
rows, any key family that hashes unevenly (or any downstream groupBy on a
derived key) concentrates bytes on few tasks. The salted repartition spreads
rows by ``xxhash64(clip_id, salt)`` — deterministic, uniform, and decoupled
from the raw key distribution. AQE skew-join handles residual join skew
(session.py enables it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 0x5A17


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    key: str = "clip_id",
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Hash-repartition on a salted key hash. One shuffle — the only one in
    the quality-filter pipeline — placed so Arrow batches are evenly sized
    regardless of input file layout or key distribution.

    The hash mixes a per-row component (``monotonically_increasing_id`` —
    deterministic given the input partition layout): a constant salt alone
    decorrelates from the raw hash clustering but still sends every
    DUPLICATE of a hot key to one partition (tests/test_partitioning.py
    proves both halves). Rows need no co-location here — the per-key
    grouping for sinks uses ``with_bucket`` separately, and keyed
    aggregations get balance from Spark's partial (map-side) aggregation.

    Streaming inputs: ``monotonically_increasing_id`` is not allowed in a
    streaming plan, so the salt falls back to (key, salt) — micro-batches
    are bounded, so residual duplicate-key clustering is bounded with them."""
    if df.isStreaming:
        return df.repartition(
            num_partitions, F.xxhash64(F.col(key), F.lit(salt))
        )
    return df.repartition(
        num_partitions,
        F.xxhash64(F.col(key), F.lit(salt), F.monotonically_increasing_id()),
    )


def with_bucket(df: DataFrame, n_buckets: int, key: str = "clip_id") -> DataFrame:
    """Deterministic bucket id — the checkpoint/resume unit (reference
    analog: the time-boxed work chunks of ``config/config.yml:67-71``)."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )
