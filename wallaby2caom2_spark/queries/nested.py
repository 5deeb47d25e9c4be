"""Nested-structure operators: the observation-tree analogs (SURVEY.md §1.1,
§2.2 P16-P18, §2.3 J1, §2.4 A1/A2) re-expressed over the TPC-H-ish tables.

The reference assembles Observation → planes → artifacts → parts → chunks
(``wallaby2caom2/main_app.py:205-231``) and re-homes artifacts between planes
by recomputed key (``wallaby2caom2/fix_product_id_visit.py:80-107``). Here:
order → lineitem structs play artifact/part; nested assembly is
``groupBy(key).agg(collect_list(struct(...)))``; tree surgery is higher-order
array functions (``F.filter``/``F.transform`` — P16/P18 analogs); re-keying
is explode → recompute key → re-aggregate (J1, a hash re-aggregation, not a
join).

Oracle outputs are flattened scalars (sizes, sums, re-keyed counts) so
cross-engine value-hashes are well-defined regardless of struct formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._tables import load


# ---------------------------------------------------------------------------
# A1/A2 analog — nested assembly: order + items tree, summarized
# ---------------------------------------------------------------------------

def nested_order_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build order→items nested rows, then P16-style prune: drop items with
    l_quantity < 10 INSIDE the array (higher-order filter), keep orders whose
    pruned tree is non-empty; emit tree-shape stats."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    items = (
        li.groupBy("l_orderkey")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("line"),
                    F.col("l_quantity").alias("qty"),
                    F.col("l_extendedprice").alias("price"),
                )
            ).alias("items")
        )
    )
    tree = orders.join(items, orders.o_orderkey == items.l_orderkey)
    pruned = tree.withColumn(
        "kept_items", F.filter(F.col("items"), lambda it: it.qty >= 10)
    )
    return (
        pruned.filter(F.size("kept_items") > 0)
        .select(
            "o_orderkey",
            F.size("items").alias("n_items"),
            F.size("kept_items").alias("n_kept_items"),
            F.aggregate(
                F.col("kept_items"),
                F.lit(0.0),
                lambda acc, it: acc + it.qty,
            )
            .cast("bigint")
            .alias("kept_qty"),
        )
    )


_NESTED_ASSEMBLY_SQL = """
WITH items AS (
  SELECT l_orderkey,
         count(*) AS n_items,
         count(*) FILTER (WHERE l_quantity >= 10) AS n_kept_items,
         coalesce(sum(l_quantity) FILTER (WHERE l_quantity >= 10), 0) AS kept_qty
  FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderkey,
       n_items::INTEGER AS n_items,
       n_kept_items::INTEGER AS n_kept_items,
       kept_qty::BIGINT AS kept_qty
FROM orders JOIN items ON o_orderkey = l_orderkey
WHERE n_kept_items > 0
"""


# ---------------------------------------------------------------------------
# J1 analog — re-key + regroup (artifact re-homing as hash re-aggregation)
# ---------------------------------------------------------------------------

def rekey_regroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Items originally grouped by order are re-homed under a recomputed key
    (their part's brand — the 'product_id from URI' analog): explode the
    nested tree → recompute key → re-aggregate. Emits per-new-key stats."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    # nested tree as built upstream (A1), then exploded — proves the
    # round-trip; Catalyst collapses collect_list+explode when possible
    items = li.select("l_orderkey", "l_partkey", "l_quantity")
    rekeyed = items.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        items.l_partkey == F.col("p_partkey"),
    )
    return (
        rekeyed.groupBy(F.col("p_brand").alias("new_key"))
        .agg(
            F.count("*").alias("n_artifacts"),
            F.countDistinct("l_orderkey").alias("n_source_planes"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        )
    )


_REKEY_REGROUP_SQL = """
SELECT p_brand AS new_key,
       count(*)::BIGINT AS n_artifacts,
       count(DISTINCT l_orderkey)::BIGINT AS n_source_planes,
       sum(l_quantity::BIGINT)::BIGINT AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# P18 analog — nested field patch via transform + withField
# ---------------------------------------------------------------------------

def nested_field_patch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch a field inside every struct of a nested array (the reference
    sets chunk.position.resolution on every chunk, ``main_app.py:210-216``):
    discount all item prices by 10% inside the array, then summarize."""
    li = load(spark, sf_dir, "lineitem")
    tree = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("line"),
                F.col("l_extendedprice").alias("price"),
            )
        ).alias("items")
    )
    patched = tree.withColumn(
        "items",
        F.transform(
            F.col("items"),
            lambda it: it.withField(
                "price_cents",
                F.round(it.price * 0.9 * 100, 0).cast("bigint"),
            ),
        ),
    )
    return patched.select(
        "l_orderkey",
        F.aggregate(
            F.col("items"),
            F.lit(0).cast("bigint"),
            lambda acc, it: acc + it.price_cents,
        ).alias("patched_total_cents"),
    )


_NESTED_PATCH_SQL = """
SELECT l_orderkey,
       sum(round(l_extendedprice * 0.9 * 100, 0)::BIGINT)::BIGINT
           AS patched_total_cents
FROM lineitem GROUP BY l_orderkey
"""


# ---------------------------------------------------------------------------
# P17 analog — conditional wipe of nested collections
# ---------------------------------------------------------------------------

def nested_conditional_wipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUXILIARY artifacts get their parts emptied (``main_app.py:202-206``):
    low-priority orders get items wiped; report how much was wiped."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    tree = (
        li.groupBy("l_orderkey")
        .agg(F.collect_list(F.struct(F.col("l_quantity").alias("qty"))).alias("items"))
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
    )
    wiped = tree.withColumn(
        "items",
        F.when(
            F.col("o_orderpriority") == "5-LOW", F.array().cast("array<struct<qty:double>>")
        ).otherwise(F.col("items")),
    )
    return wiped.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.size("items")).cast("bigint").alias("n_items_kept"),
    )


_NESTED_WIPE_SQL = """
WITH t AS (
  SELECT o_orderpriority, o_orderkey, count(*) AS n_items
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)
SELECT o_orderpriority,
       count(*)::BIGINT AS n_orders,
       sum(CASE WHEN o_orderpriority = '5-LOW' THEN 0 ELSE n_items END)::BIGINT
           AS n_items_kept
FROM t GROUP BY 1
"""


# ---------------------------------------------------------------------------
# two-level tree profile — Observation→plane→artifact depth, measured
# ---------------------------------------------------------------------------

def nested_two_level_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-level nested assembly (customer → orders[] → items[]) with the
    shape statistics computed by NESTED higher-order functions — the
    reference's Observation→planes→artifacts depth
    (``wallaby2caom2/main_app.py:205-231``) exercised one level deeper
    than the other nested ops: per customer, total leaf count and the
    maximum per-order fan-out are folds over an array of structs that
    each carry an inner array, entirely in codegen. The published
    relation is the corpus histogram of tree widths (orders per
    customer) with leaf/fan-out aggregates per width.

    Scale shape: two hash re-aggregations (items→order, order→customer —
    the A1/A2 chain) build the tree; the folds are map-side expressions
    on the assembled rows; the histogram is a third, tiny aggregation.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    items = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("line"),
                F.col("l_quantity").alias("qty"),
            )
        ).alias("items")
    )
    per_cust = (
        orders.join(items, orders.o_orderkey == items.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.collect_list(
                F.struct(F.col("o_orderkey").alias("okey"), F.col("items"))
            ).alias("otree")
        )
    )
    n_orders = F.size("otree")
    n_leaves = F.aggregate(
        F.col("otree"), F.lit(0), lambda acc, o: acc + F.size(o.items)
    )
    max_fanout = F.aggregate(
        F.col("otree"), F.lit(0), lambda acc, o: F.greatest(acc, F.size(o.items))
    )
    shaped = per_cust.select(
        n_orders.alias("n_orders"),
        n_leaves.alias("n_leaves"),
        max_fanout.alias("max_fanout"),
    )
    return (
        shaped.groupBy("n_orders")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_leaves").cast("bigint").alias("total_leaves"),
            F.max("max_fanout").alias("widest_order"),
        )
        .orderBy("n_orders")
    )


_TWO_LEVEL_SQL = """
WITH per_order AS (
  SELECT l_orderkey, count(*)::INTEGER AS n_items
  FROM lineitem GROUP BY l_orderkey
),
per_cust AS (
  SELECT o_custkey,
         count(*)::INTEGER AS n_orders,
         sum(n_items)::INTEGER AS n_leaves,
         max(n_items)::INTEGER AS max_fanout
  FROM orders JOIN per_order ON o_orderkey = l_orderkey
  GROUP BY o_custkey
)
SELECT n_orders, count(*)::BIGINT AS n_customers,
       sum(n_leaves)::BIGINT AS total_leaves,
       max(max_fanout)::INTEGER AS widest_order
FROM per_cust GROUP BY n_orders ORDER BY n_orders
"""


QUERIES = {
    "nested_order_assembly": nested_order_assembly,
    "rekey_regroup": rekey_regroup,
    "nested_field_patch": nested_field_patch,
    "nested_conditional_wipe": nested_conditional_wipe,
    "nested_two_level_profile": nested_two_level_profile,
}

ORACLE = {
    "nested_order_assembly": _NESTED_ASSEMBLY_SQL,
    "rekey_regroup": _REKEY_REGROUP_SQL,
    "nested_field_patch": _NESTED_PATCH_SQL,
    "nested_conditional_wipe": _NESTED_WIPE_SQL,
    "nested_two_level_profile": _TWO_LEVEL_SQL,
}
