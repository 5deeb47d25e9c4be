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


def _contains_unsaltable(dt: T.DataType) -> bool:
    """True when the type — at ANY nesting depth — is binary (hashing a
    50 KB payload per row defeats the cheap-salt goal) or map (xxhash64
    rejects MapType at analysis). A top-level isinstance check would let a
    struct<meta: map<...>> abort the whole job, or a struct-wrapped binary
    silently pay the payload-hash cost."""
    if isinstance(dt, _UNSALTABLE):
        return True
    if isinstance(dt, T.StructType):
        return any(_contains_unsaltable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _contains_unsaltable(dt.elementType)
    return False


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
            if f.name != key and not _contains_unsaltable(f.dataType)
        ]
    parts = [F.col(key), F.lit(salt), *(F.col(c) for c in content_cols)]
    return df.repartition(num_partitions, F.xxhash64(*parts))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    row_key: str,
    n_salts: int = 8,
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Skew-safe shuffle equi-join: replicate the (small) ``dim`` side
    ``n_salts``× and scatter ``fact`` rows across the replicas by a
    deterministic hash of ``row_key``, so a hot join key's rows land on
    ``n_salts`` reducers instead of one.

    This is the explicit form of what AQE's skew-join split does at
    runtime — kept as a first-class operator because AQE only splits
    post-shuffle partitions it can observe; a single key whose rows exceed
    one executor's memory needs the salt BEFORE the exchange. The salt is
    ``pmod(xxhash64(row_key, salt), n_salts)`` — deterministic per row, so
    stage retries reproduce identical routing (same argument as
    ``salted_repartition``).

    Join correctness is unchanged: every fact row still meets exactly one
    replica of its dim row (the one carrying its salt value). The cost is
    ``n_salts``× the dim shuffle volume — use for genuinely small dims
    (else broadcast the dim and no shuffle happens at all; this operator
    is for dims too big to broadcast joined to facts too skewed to hash)."""
    salt_vals = F.array(*[F.lit(i) for i in range(n_salts)])
    dim_rep = dim.withColumn("__salt", F.explode(salt_vals))
    fact_s = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(row_key), F.lit(salt)), F.lit(n_salts)).cast("int"),
    )
    return fact_s.join(dim_rep, on=[key, "__salt"], how="inner").drop("__salt")


def with_bucket(df: DataFrame, n_buckets: int, key: str = "clip_id") -> DataFrame:
    """Deterministic bucket id — the checkpoint/resume unit (reference
    analog: the time-boxed work chunks of ``config/config.yml:67-71``)."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )
