"""Explicit partitioning / skew control (north rule).

The generator plants hot clip_id prefixes (datagen.py ``hot_*``); at 10^12
rows, any key family that hashes unevenly (or any downstream groupBy on a
derived key) concentrates bytes on few tasks. The salted repartition spreads
rows by ``xxhash64(clip_id, salt)`` — deterministic, uniform, and decoupled
from the raw key distribution. AQE skew-join handles residual join skew
(session.py enables it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SALT = 0x5A17

# Types excluded from the automatic per-row salt: binary payloads (hashing
# ~50 KB per row in the exchange is wasted work — and `bytes` must already
# be gone before any shuffle per the pipeline contract) and maps (xxhash64
# rejects MapType unless a legacy flag is set).
_UNSALTABLE = (T.BinaryType, T.MapType)


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    key: str = "clip_id",
    salt: int = DEFAULT_SALT,
    content_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Hash-repartition on a salted key hash. One shuffle — the only one in
    the quality-filter pipeline — placed so Arrow batches are evenly sized
    regardless of input file layout or key distribution.

    The hash is ``xxhash64(key, salt, *content_cols)`` — fully DETERMINISTIC
    per row. A constant salt alone decorrelates from the raw hash clustering
    but still sends every DUPLICATE of a hot key to one partition, so the
    row's own content columns (default: every non-binary/non-map column)
    join the hash and spread duplicate hot keys across partitions
    (tests/test_partitioning.py proves both halves). Rows need no
    co-location here — the per-key grouping for sinks uses ``with_bucket``
    separately, and keyed aggregations get balance from Spark's partial
    (map-side) aggregation.

    Determinism matters at scale: a nondeterministic component (e.g.
    ``monotonically_increasing_id``, ``rand``) makes the shuffle key depend
    on upstream partition layout, so a lost-executor stage retry can route
    re-computed rows to different reducers than the first attempt —
    duplicating or dropping rows (the SPARK-23207 round-robin hazard).
    With a pure row-content hash, any re-execution reproduces identical
    routing. Rows that are full duplicates (every column equal) still
    co-locate, which is harmless — they are indistinguishable anyway."""
    if content_cols is None:
        content_cols = [
            f.name
            for f in df.schema.fields
            if f.name != key and not isinstance(f.dataType, _UNSALTABLE)
        ]
    parts = [F.col(key), F.lit(salt), *(F.col(c) for c in content_cols)]
    return df.repartition(num_partitions, F.xxhash64(*parts))


def with_bucket(df: DataFrame, n_buckets: int, key: str = "clip_id") -> DataFrame:
    """Deterministic bucket id — the checkpoint/resume unit (reference
    analog: the time-boxed work chunks of ``config/config.yml:67-71``)."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )
