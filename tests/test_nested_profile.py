"""Two-level tree profile (queries/nested.py::nested_two_level_profile):
nested higher-order folds produce exact leaf counts and fan-outs on a
planted customer→orders→items forest."""

from __future__ import annotations

from pyspark.sql import functions as F

from wallaby2caom2_spark.queries.nested import nested_two_level_profile


def test_planted_forest_exact_shape(spark, tmp_path):
    # customer 1: two orders with 3 and 1 items; customer 2: one order, 2
    orders = spark.createDataFrame(
        [
            (10, 1, "O", 0.0, "2000-01-01", "3-MEDIUM"),
            (11, 1, "O", 0.0, "2000-01-02", "3-MEDIUM"),
            (20, 2, "O", 0.0, "2000-01-03", "3-MEDIUM"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li_rows = [(10, i) for i in range(1, 4)] + [(11, 1)] + [(20, 1), (20, 2)]
    lineitem = spark.createDataFrame(
        [(ok, ln, 1, ln, 5.0, 1.0, 0.0, 0.0, "N", "O", "2000-02-01") for ok, ln in li_rows],
        "l_orderkey long, l_linenumber int, l_suppkey long, l_partkey long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    )
    d = str(tmp_path / "t")
    orders.write.parquet(f"{d}/orders.parquet")
    lineitem.write.parquet(f"{d}/lineitem.parquet")
    out = {r["n_orders"]: r for r in nested_two_level_profile(spark, d).collect()}
    # customer 1: width 2, leaves 4, widest order 3; customer 2: width 1
    assert out[2]["n_customers"] == 1
    assert out[2]["total_leaves"] == 4
    assert out[2]["widest_order"] == 3
    assert out[1]["n_customers"] == 1
    assert out[1]["total_leaves"] == 2
    assert out[1]["widest_order"] == 2
