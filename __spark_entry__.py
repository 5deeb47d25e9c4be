"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``wallaby2caom2_spark/queries/`` — one module per
operator family (relational reference analogs, dedup, similarity, text
stats, clips flagship).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wallaby2caom2_spark.queries import ALL_ORACLE, ALL_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the clips quality-filter pipeline at sf0.001 (decode →
    langid/perplexity → rule cascade → regex scrub), per BASELINE.json."""
    from wallaby2caom2_spark.queries.clips_flagship import clips_quality_filter

    return clips_quality_filter(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + the
    training-data ops (dedup / similarity / text analysis / multimodal)."""
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — EVERY registered query has one.
    The pandas-UDF stages (decode/langid/scrub/audio ops) are not
    SQL-expressible directly, so their per-clip outputs are persisted by
    the pure-Python oracle-replay fixture (fixtures.py, bit-identical to
    the UDFs per tests/test_fixtures.py) and DuckDB replays every
    downstream classification/aggregation from it under the full
    rows+schema+value-hash check."""
    from wallaby2caom2_spark.queries import ALL_ORACLE_BUILDERS

    # clips/shards queries replay from per-sf fixture parquets (the clips
    # cache, the image-mix side table, and the pure-Python oracle fixture —
    # wallaby2caom2_spark/fixtures.py, bit-identical to the UDFs, pinned in
    # tests/test_fixtures.py), so their SQL is BUILT here at the driver's
    # comparison scale; scripts/check_oracle.py re-derives for other scales
    sf = "/root/testdata/sf0.01"
    out = dict(ALL_ORACLE)
    for name, build in ALL_ORACLE_BUILDERS.items():
        out[name] = build(sf)
    return out
