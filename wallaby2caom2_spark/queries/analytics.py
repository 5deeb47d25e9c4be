"""Analytical operator coverage beyond the reference's surface (SURVEY.md
§2.4/§2.5 notes): rollup/grouping sets, gap-based sessionization, exact
percentiles, set operations, and cardinality sketches — the aggregation
toolbox a 100 TB metrics/lineage layer leans on.

Cross-engine notes: rollup NULL-group labels are coalesced to 'ALL' in both
engines; sessionization ties are broken on (ts, event_id); percentiles use
linear interpolation over the same doubles in both engines and are rounded;
approx-distinct sketches differ by implementation, so the checked output is
the exact count plus a both-engines-within-tolerance boolean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._tables import load


# ---------------------------------------------------------------------------
# rollup — region/nation revenue at every grouping level
# ---------------------------------------------------------------------------

def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast(
        "bigint"
    )
    joined = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(F.col("r_name"), F.col("n_name"), rev.alias("rev_cents"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.sum("rev_cents").alias("revenue_cents"), F.count("*").alias("n_items"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "revenue_cents",
            "n_items",
        )
    )


_ROLLUP_SQL = """
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       sum(round(l_extendedprice*(1-l_discount)*100, 0)::BIGINT)::BIGINT
           AS revenue_cents,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------------------------
# gap-based sessionization — session_window vs SQL island detection
# ---------------------------------------------------------------------------

_GAP = "30 minutes"


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    sessions = (
        ev.groupBy(F.session_window("ts", _GAP).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("total_events"),
    )


_SESSIONIZE_SQL = """
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
), per_session AS (
  SELECT user_id, sid, count(*) AS n_events FROM s GROUP BY 1, 2
)
SELECT user_id,
       count(*)::BIGINT AS n_sessions,
       max(n_events)::BIGINT AS max_session_events,
       sum(n_events)::BIGINT AS total_events
FROM per_session GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# exact percentiles — interpolated order statistics per group
# ---------------------------------------------------------------------------

def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)") + 1e-9, 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)") + 1e-9, 4).alias("p95"),
        F.count("*").alias("n"),
    )


_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5) + 1e-9, 4) AS p50,
       round(quantile_cont(value, 0.95) + 1e-9, 4) AS p95,
       count(*)::BIGINT AS n
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# set operations — INTERSECT / EXCEPT between behavioral cohorts
# ---------------------------------------------------------------------------

def cohort_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT semantics as ONE plan: per-user membership flags in
    a single aggregation, then conditional counts + stack() to rows — no
    driver-side .count() round-trips (each would be a separate job over the
    events table; at 100 TB that's two full extra scans)."""
    ev = load(spark, sf_dir, "events")
    flags = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .groupBy("user_id")
        .agg(
            F.max(F.col("event_type") == "purchase").alias("is_buyer"),
            F.max(F.col("event_type") == "error").alias("is_err"),
        )
    )
    counts = flags.agg(
        F.coalesce(
            F.sum((F.col("is_buyer") & F.col("is_err")).cast("long")), F.lit(0)
        ).alias("both"),
        F.coalesce(
            F.sum((F.col("is_buyer") & ~F.col("is_err")).cast("long")), F.lit(0)
        ).alias("buy_only"),
    )
    return counts.selectExpr(
        "stack(2, 'both', both, 'buy_only', buy_only) AS (cohort, n_users)"
    )


_COHORT_SQL = """
WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type='purchase'),
err AS (SELECT DISTINCT user_id FROM events WHERE event_type='error')
SELECT 'both' AS cohort,
       (SELECT count(*) FROM (SELECT * FROM buyers INTERSECT SELECT * FROM err))::BIGINT AS n_users
UNION ALL
SELECT 'buy_only',
       (SELECT count(*) FROM (SELECT * FROM buyers EXCEPT SELECT * FROM err))::BIGINT
"""


# ---------------------------------------------------------------------------
# cardinality sketches — approx_count_distinct as a sanity counter (A5 note)
# ---------------------------------------------------------------------------

def cardinality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    agg = ev.agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    ).select(
        F.lit("events.user_id").alias("column_name"),
        "n_exact",
        (F.abs(F.col("approx") - F.col("n_exact")) / F.col("n_exact") < 0.1).alias(
            "approx_within_10pct"
        ),
    )
    return agg


_CARDINALITY_SQL = """
SELECT 'events.user_id' AS column_name,
       count(DISTINCT user_id)::BIGINT AS n_exact,
       (abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        / count(DISTINCT user_id)::DOUBLE) < 0.1 AS approx_within_10pct
FROM events
"""


# ---------------------------------------------------------------------------
# JSON extraction — typed projection out of a JSON props column
# ---------------------------------------------------------------------------

def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_JSON_PROPS_SQL = """
SELECT event_type, count(*)::BIGINT AS n,
       sum(json_extract_string(props, '$.k')::INTEGER)::BIGINT AS sum_k,
       min(json_extract_string(props, '$.k')::INTEGER)::INTEGER AS min_k,
       max(json_extract_string(props, '$.k')::INTEGER)::INTEGER AS max_k
FROM events GROUP BY event_type
"""


QUERIES = {
    "json_props_extract": json_props_extract,
    "rollup_revenue": rollup_revenue,
    "sessionize_events": sessionize_events,
    "value_percentiles": value_percentiles,
    "cohort_setops": cohort_setops,
    "cardinality_stats": cardinality_stats,
}

ORACLE = {
    "json_props_extract": _JSON_PROPS_SQL,
    "rollup_revenue": _ROLLUP_SQL,
    "sessionize_events": _SESSIONIZE_SQL,
    "value_percentiles": _PERCENTILES_SQL,
    "cohort_setops": _COHORT_SQL,
    "cardinality_stats": _CARDINALITY_SQL,
}
