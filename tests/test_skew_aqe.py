"""AQE skew-join runtime evidence. The repo's skew story is two-layer
(operators/partitioning.py module docstring): deterministic salting BEFORE
the exchange for known-hot keys, AQE's OptimizeSkewedJoin at runtime for
residual join skew. The salting half is pinned in test_partitioning.py;
this file pins the AQE half — the session's adaptive config really does
split a skewed sort-merge join at runtime — and the equivalence of the
explicit ``salted_join`` on the same skewed input.

Two non-obvious preconditions, both discovered empirically and worth
pinning so a refactor doesn't silently lose the protection:
- the skewed side's WIDTH must survive column pruning down to the
  exchange (a pruned-to-the-key shuffle compresses below any realistic
  threshold and AQE just coalesces);
- a consumer that re-uses the join's hash partitioning (groupBy on the
  join key) suppresses the split unless
  ``spark.sql.adaptive.forceOptimizeSkewedJoin`` is set — skew-splitting
  breaks the partitioning guarantee, and AQE won't add a shuffle to buy
  balance by default.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from wallaby2caom2_spark.operators.partitioning import salted_join

# thresholds scaled down so a ~60 MB test join exhibits what a multi-GB
# partition does in production (defaults: 256m threshold, 5x factor)
_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


@contextmanager
def _confs(spark, overrides):
    saved = {}
    for k, v in overrides.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_fact(spark, n=2_000_000):
    """~70% of rows share join key 0; 64-char payload so the hot shuffle
    partition is genuinely oversized, not just row-heavy."""
    return spark.range(0, n).select(
        F.when(F.col("id") % 10 < 7, 0)
        .otherwise(F.col("id") % 997)
        .alias("k"),
        F.sha2(F.concat(F.lit("p"), F.col("id")), 256).alias("v"),
    )


def _dim(spark):
    return spark.range(0, 997).select(
        F.col("id").alias("k"),
        F.sha2(F.concat(F.lit("d"), F.col("id")), 256).alias("dv"),
    )


def _final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_the_skewed_sortmerge_join(spark):
    with _confs(spark, _SKEW_CONFS):
        j = (
            _skewed_fact(spark)
            .join(_dim(spark), "k")
            # global agg: no required child distribution, so AQE is free
            # to split; keeps BOTH sides' payloads alive through the join
            .agg(
                F.count("*").alias("n"),
                F.max(F.concat("v", "dv")).alias("m"),
            )
        )
        [row] = j.collect()
        assert row["n"] == 2_000_000
        plan = _final_plan(j)
    assert "SortMergeJoin(skew=true)" in plan, plan
    assert "skewed" in plan  # the AQEShuffleRead that carries the split


def test_no_split_without_the_flag_same_workload(spark):
    """Control for the assertion above: identical join with skewJoin
    disabled keeps the plain SMJ — proves the marker tracks the feature,
    not some other plan detail."""
    with _confs(
        spark,
        {**_SKEW_CONFS, "spark.sql.adaptive.skewJoin.enabled": "false"},
    ):
        j = (
            _skewed_fact(spark)
            .join(_dim(spark), "k")
            .agg(F.count("*").alias("n"))
        )
        assert j.collect()[0]["n"] == 2_000_000
        plan = _final_plan(j)
    assert "skew=true" not in plan


def test_salted_join_matches_plain_join_on_skewed_input(spark):
    """The explicit pre-exchange operator returns byte-identical results:
    per-key counts and a content checksum agree with the unsalted join."""
    fact = _skewed_fact(spark, n=200_000).withColumn(
        "row_key", F.concat(F.lit("r"), F.monotonically_increasing_id())
    )
    dim = _dim(spark)
    plain = (
        fact.join(dim, "k")
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("v", "dv")).alias("chk"),
        )
    )
    salted = (
        salted_join(fact, dim, key="k", row_key="row_key", n_salts=8)
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("v", "dv")).alias("chk"),
        )
    )
    assert sorted(plain.collect()) == sorted(salted.collect())
