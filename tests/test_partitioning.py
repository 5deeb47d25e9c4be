"""Skew-kill evidence (north rule: explicit salted repartitioning on clip_id).

The generator plants hot key prefixes (``hot_0``..``hot_6`` share 7 ids
across ~5% of rows — datagen.py skew_hot_frac). A raw hash repartition on
clip_id piles every duplicate id onto the same partitions; the salted
repartition spreads rows near-uniformly regardless of key skew.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wallaby2caom2_spark import datagen
from wallaby2caom2_spark.operators.partitioning import salted_repartition, with_bucket

N_PARTS = 16


@pytest.fixture(scope="module")
def skewed(spark, tmp_path_factory):
    """Heavily skewed table: ~29% of rows (800 of 2800) share ONE clip_id value."""
    path = str(tmp_path_factory.mktemp("skew") / "clips")
    datagen.write_clips_parquet(path, 2000, seed=13, rows_per_file=1000)
    df = spark.read.parquet(path).select("clip_id", "sr_hz", "transcript")
    hot = df.limit(800).withColumn("clip_id", F.lit("hot_key"))
    return df.unionByName(hot)


def _sizes(df) -> list[int]:
    rows = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    return [int(r["count"]) for r in rows]


def test_raw_key_repartition_is_skewed(spark, skewed):
    sizes = _sizes(skewed.repartition(N_PARTS, F.col("clip_id")))
    total = sum(sizes)
    # the hot key concentrates ≥ 800 of 2800 rows in one partition
    assert max(sizes) >= 0.28 * total


def test_salted_repartition_balances(spark, skewed):
    sizes = _sizes(salted_repartition(skewed, N_PARTS))
    total = sum(sizes)
    assert len(sizes) == N_PARTS
    # near-uniform despite 40% duplicate keys: no partition above 2x ideal
    assert max(sizes) <= 2.0 * (total / N_PARTS)


def test_salted_repartition_is_deterministic(spark, skewed):
    """Same input → identical partition routing across independent runs.

    The salt must be a pure function of row content (no
    monotonically_increasing_id / rand): a stage retry after a lost
    executor re-executes map tasks, and nondeterministic routing there
    duplicates or drops rows (SPARK-23207 class)."""

    def assignment(df):
        rows = (
            salted_repartition(df, N_PARTS)
            .withColumn("pid", F.spark_partition_id())
            .select("clip_id", "transcript", "pid")
            .collect()
        )
        return {(r["clip_id"], r["transcript"]): r["pid"] for r in rows}

    # shuffle upstream layout between runs: coalesce changes input split
    # boundaries, which is exactly what a retry/AQE re-plan can do
    a = assignment(skewed)
    b = assignment(skewed.coalesce(3))
    assert a == b


def test_bucket_is_deterministic(spark, skewed):
    a = {
        (r["clip_id"], r["bucket"])
        for r in with_bucket(skewed, 8).select("clip_id", "bucket").collect()
    }
    b = {
        (r["clip_id"], r["bucket"])
        for r in with_bucket(skewed, 8).select("clip_id", "bucket").collect()
    }
    assert a == b
    buckets = {x[1] for x in a}
    assert buckets <= set(range(8))


def test_salted_join_matches_plain_join(spark, skewed):
    """Salting only changes shuffle layout — the joined result must be
    row-identical to a plain equi-join on the same inputs."""
    from wallaby2caom2_spark.operators.partitioning import salted_join

    fact = skewed.select("clip_id", "sr_hz", "transcript")
    dim = fact.groupBy("clip_id").agg(F.max("sr_hz").alias("max_sr"))
    salted = salted_join(fact, dim, key="clip_id", row_key="transcript")
    plain = fact.join(dim, on="clip_id", how="inner")
    cols = ["clip_id", "sr_hz", "transcript", "max_sr"]
    a = sorted(map(tuple, salted.select(cols).collect()))
    b = sorted(map(tuple, plain.select(cols).collect()))
    assert a == b


def test_salted_join_scatters_hot_key(spark, skewed):
    """The hot key's fact rows must spread across multiple salt replicas
    (the whole point: >1 reducer handles the hot key)."""
    from wallaby2caom2_spark.operators.partitioning import salted_join

    fact = skewed.select("clip_id", "transcript").withColumn(
        "__probe_salt",
        F.pmod(F.xxhash64(F.col("transcript"), F.lit(0x5A17)), F.lit(8)).cast("int"),
    )
    n_salts_hot = (
        fact.filter(F.col("clip_id") == "hot_key")
        .select("__probe_salt")
        .distinct()
        .count()
    )
    assert n_salts_hot >= 4  # 800 hot rows over 8 salts — all 8 w.h.p.

    dim = fact.groupBy("clip_id").count().drop("count")
    out = salted_join(
        fact.drop("__probe_salt"), dim, key="clip_id", row_key="transcript"
    )
    assert out.filter(F.col("clip_id") == "hot_key").count() == 800


def test_salted_repartition_skips_nested_unsaltable(spark):
    """Binary/map types nested inside structs or arrays must be excluded
    from the default content-salt: a struct-wrapped map would abort the
    job at analysis (xxhash64 rejects MapType), a struct-wrapped binary
    would silently hash the whole payload per row."""
    from pyspark.sql import functions as F

    from wallaby2caom2_spark.operators.partitioning import salted_repartition

    df = spark.range(10).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("clip_id"),
        F.struct(
            F.create_map(F.lit("a"), F.lit("b")).alias("meta"),
        ).alias("wrapped_map"),
        F.array(F.lit(b"xx").cast("binary")).alias("chunks"),
        F.col("id").alias("v"),
    )
    out = salted_repartition(df, 4)  # must not raise on the nested map
    assert out.count() == 10
