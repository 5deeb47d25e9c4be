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
    """DuckDB-equivalent SQL per query. Most clips entries are omitted (the
    pandas-UDF decode/langid/scrub stages are not SQL-expressible → driver
    rows-only check + golden pytest), but ``multimodal_media_meta`` IS
    oracle-checked: its sniff + stub geometry are pure arithmetic, so DuckDB
    recomputes it from the same cached clips parquet (path baked in at
    sf0.01 — the driver's comparison scale; generated here if absent)."""
    from wallaby2caom2_spark.queries.clips_flagship import (
        dropout_stats_oracle,
        duration_histogram_oracle,
        fingerprint_neardup_oracle,
        media_meta_oracle,
        metrics_oracle,
        quality_filter_oracle,
        speaking_rate_oracle,
        vad_stats_oracle,
        waveform_preview_oracle,
    )

    sf = "/root/testdata/sf0.01"
    out = dict(ALL_ORACLE)
    out["multimodal_media_meta"] = media_meta_oracle(sf)
    out["clips_duration_histogram"] = duration_histogram_oracle(sf)
    # clips queries replayed from the pure-Python oracle fixture
    # (wallaby2caom2_spark/fixtures.py — labeler + shared per-clip helpers,
    # bit-identical to the UDFs, pinned in tests/test_fixtures.py)
    out["audio_dropout_stats"] = dropout_stats_oracle(sf)
    out["audio_vad_stats"] = vad_stats_oracle(sf)
    out["clips_quality_filter"] = quality_filter_oracle(sf)
    out["clips_metrics"] = metrics_oracle(sf)
    out["audio_speaking_rate_gate"] = speaking_rate_oracle(sf)
    out["audio_fingerprint_neardup"] = fingerprint_neardup_oracle(sf)
    out["clips_waveform_preview"] = waveform_preview_oracle(sf)
    return out
