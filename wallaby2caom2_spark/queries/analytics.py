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
# funnel — ordered-step conversion as ONE conditional aggregation
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ("signup", "click", "purchase")


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → click → purchase): a user converts at step
    k when their FIRST occurrence of each step so far is time-ordered.
    One groupBy(user) computing min-ts per step (conditional aggregation —
    no per-step self-joins, which would be k-1 extra shuffles of the full
    table at 100 TB), then one tiny rollup of step flags to the funnel
    table. Epoch-microsecond comparisons; integer-only output."""
    ev = load(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, ts_us)).alias(f"t_{s}")
            for s in _FUNNEL_STEPS
        ]
    )
    s1, s2, s3 = (F.col(f"t_{s}") for s in _FUNNEL_STEPS)
    flags = firsts.select(
        s1.isNotNull().alias("f1"),
        (s1.isNotNull() & s2.isNotNull() & (s2 > s1)).alias("f2"),
        (
            s1.isNotNull()
            & s2.isNotNull()
            & s3.isNotNull()
            & (s2 > s1)
            & (s3 > s2)
        ).alias("f3"),
    )
    agg = flags.agg(
        F.sum(F.col("f1").cast("long")).alias("n1"),
        F.sum(F.col("f2").cast("long")).alias("n2"),
        F.sum(F.col("f3").cast("long")).alias("n3"),
    )
    return agg.selectExpr(
        "stack(3, 'signup', n1, 'signup>click', n2, 'signup>click>purchase', n3)"
        " AS (step, n_users)"
    )


_FUNNEL_SQL = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t1,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t2,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t3
  FROM events GROUP BY user_id
),
flags AS (
  SELECT t1 IS NOT NULL AS f1,
         (t1 IS NOT NULL AND t2 IS NOT NULL AND t2 > t1) AS f2,
         (t1 IS NOT NULL AND t2 IS NOT NULL AND t3 IS NOT NULL
          AND t2 > t1 AND t3 > t2) AS f3
  FROM firsts
),
agg AS (
  SELECT sum(CASE WHEN f1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN f2 THEN 1 ELSE 0 END)::BIGINT AS n2,
         sum(CASE WHEN f3 THEN 1 ELSE 0 END)::BIGINT AS n3
  FROM flags
)
SELECT 'signup' AS step, n1 AS n_users FROM agg
UNION ALL SELECT 'signup>click', n2 FROM agg
UNION ALL SELECT 'signup>click>purchase', n3 FROM agg
"""


# ---------------------------------------------------------------------------
# fixed-width histogram — distribution profile as one aggregation
# ---------------------------------------------------------------------------

_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 1000.0, 20


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of ``value`` per event type: bin id is a pure
    projection (floor((v-lo)/w), clamped to the edge bins), counts are one
    partially-aggregated groupBy — the single-pass distribution profile a
    quality dashboard runs at 100 TB, where an exact percentile would need
    a sort. Integer-only output; bin boundaries are literals in both
    engines (half-open [lo, hi) bins, ties-to-lower at exact edges in
    both)."""
    ev = load(spark, sf_dir, "events")
    w = (_HIST_HI - _HIST_LO) / _HIST_BINS
    raw_bin = F.floor((F.col("value") - F.lit(_HIST_LO)) / F.lit(w))
    bin_id = (
        F.when(raw_bin < 0, -1)
        .when(raw_bin >= _HIST_BINS, _HIST_BINS)
        .otherwise(raw_bin)
        .cast("int")
    )
    return (
        ev.groupBy("event_type", bin_id.alias("bin_id"))
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "bin_id")
    )


_HISTOGRAM_SQL = f"""
WITH b AS (
  SELECT event_type,
         CASE
           WHEN floor((value - {_HIST_LO}) / {(_HIST_HI - _HIST_LO) / _HIST_BINS}) < 0 THEN -1
           WHEN floor((value - {_HIST_LO}) / {(_HIST_HI - _HIST_LO) / _HIST_BINS}) >= {_HIST_BINS} THEN {_HIST_BINS}
           ELSE floor((value - {_HIST_LO}) / {(_HIST_HI - _HIST_LO) / _HIST_BINS})
         END::INT AS bin_id
  FROM events
)
SELECT event_type, bin_id, count(*)::BIGINT AS n
FROM b GROUP BY event_type, bin_id ORDER BY event_type, bin_id
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


def quantile_sketch_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL/GK-style sketch — mergeable partials, the
    100 TB path where exact percentile would sort-shuffle the column) with
    an IN-PLAN tolerance check against the exact percentile, the same
    design as cardinality_stats: sketch values differ by implementation
    across engines, so the checked output is the exact value plus a
    both-engines-must-agree within-tolerance boolean (a sketch regression
    flips the boolean on the Spark side only → hash mismatch).  All three
    percentiles come from ONE aggregation over ONE scan (array-typed
    percentile/approx_percentile, then a 1-row posexplode) — three unioned
    per-q aggregates would scan the table three times."""
    ev = load(spark, sf_dir, "events")
    qs = "array(0.5D, 0.9D, 0.99D)"
    agg = ev.agg(
        F.expr(f"percentile(value, {qs})").alias("exact"),
        F.expr(f"approx_percentile(value, {qs}, 10000)").alias("approx"),
        (F.max("value") - F.min("value")).alias("spread"),
    )
    exploded = agg.select(
        F.posexplode(F.arrays_zip("exact", "approx")).alias("i", "pair"),
        "spread",
    ).select(
        F.element_at(F.expr(qs), F.col("i") + 1).alias("q"),
        F.round(F.col("pair.exact") + 1e-9, 6).alias("exact_value"),
        (
            F.abs(F.col("pair.approx") - F.col("pair.exact")) / F.col("spread")
            < 0.01
        ).alias("approx_within_1pct"),
    )
    return exploded.orderBy("q")


_QUANTILE_SKETCH_SQL = """
WITH stats AS (
  SELECT max(value) - min(value) AS spread FROM events
)
SELECT q::DOUBLE AS q,
       round(exact_value + 1e-9, 6) AS exact_value,
       abs(approx_value - exact_value) / (SELECT spread FROM stats) < 0.01
         AS approx_within_1pct
FROM (
  SELECT 0.5 AS q, quantile_cont(value, 0.5) AS exact_value,
         approx_quantile(value, 0.5) AS approx_value FROM events
  UNION ALL
  SELECT 0.9, quantile_cont(value, 0.9), approx_quantile(value, 0.9)
  FROM events
  UNION ALL
  SELECT 0.99, quantile_cont(value, 0.99), approx_quantile(value, 0.99)
  FROM events
)
ORDER BY q
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


# ---------------------------------------------------------------------------
# as-of join — each purchase picks the most recent prior click, per user
# ---------------------------------------------------------------------------

def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (an operator Spark has no native form of): for every
    ``purchase`` event, the most recent strictly-prior ``click`` of the same
    user.

    Implemented as the SINGLE-PASS union+window formulation, not a join at
    all: both event types flow through one window partitioned by ``user_id``
    and the purchase row reads ``last(click_ts) ignorenulls`` over the
    preceding frame. One shuffle on the user key, no join build side, no
    skew amplification — the shape that beats a sort-merge band join at
    10^12 rows. Ties broken on (ts, event_id) in both engines."""
    from pyspark.sql.window import Window

    ev = (
        load(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → UTC instant
        .filter(F.col("event_type").isin("click", "purchase"))
    )
    click_us = F.when(
        F.col("event_type") == "click", F.unix_micros(F.col("ts"))
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        ev.withColumn("asof_click_us", F.last(click_us, ignorenulls=True).over(w))
        .withColumn("asof_click_id", F.last(click_id, ignorenulls=True).over(w))
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("asof_click_us").isNotNull()
        )
    )
    gap_s = (F.unix_micros(F.col("ts")) - F.col("asof_click_us")) / F.lit(
        1_000_000.0
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_click_id").cast("bigint").alias("asof_click_id"),
        F.round(gap_s + 1e-9, 3).alias("gap_s"),
    )


_ASOF_SQL = """
WITH ev AS (
  SELECT event_id, ts, user_id, event_type,
         CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us,
         CASE WHEN event_type = 'click' THEN event_id END AS click_id
  FROM events WHERE event_type IN ('click', 'purchase')
),
w AS (
  SELECT event_id, ts, user_id, event_type,
         last_value(click_us IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_click_us,
         last_value(click_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_click_id
  FROM ev
)
SELECT event_id, user_id, asof_click_id::BIGINT AS asof_click_id,
       round((epoch_us(ts) - asof_click_us) / 1000000.0 + 1e-9, 3) AS gap_s
FROM w
WHERE event_type = 'purchase' AND asof_click_us IS NOT NULL
"""


# ---------------------------------------------------------------------------
# range join — clicks within 5 minutes after each error, via bucket join
# ---------------------------------------------------------------------------

_RANGE_S = 300  # window width in seconds (= bucket width)


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join — another operator Spark lacks natively: for
    each ``error`` event, count the ``click`` events anywhere in
    ``[t, t + 300 s)``.

    A naive theta join is a cartesian product the optimizer cannot save.
    The scale shape used here is the TIME-BUCKET join: bucket width equals
    the range width, every left row explodes into its 2 candidate buckets
    (floor(t/δ) and +1 — any right row inside the range must sit in one of
    them), the right side keys by its own bucket, and the product collapses
    to an EQUI-join on the bucket id with the exact predicate applied after.
    Work per bucket is O(events-per-δ²) locally instead of O(N²) globally;
    skewed buckets split under AQE like any hot equi-key."""
    ev = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.unix_micros(F.col("ts")).alias("t_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.unix_micros(F.col("ts")).alias("c_us"),
    )
    bucket_us = _RANGE_S * 1_000_000
    # exact integer division — double division can misround at bucket
    # boundaries and route a row to the wrong bucket
    left = errors.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"t_us div {bucket_us}"),
                F.expr(f"t_us div {bucket_us}") + 1,
            )
        ),
    )
    right = clicks.withColumn("bucket", F.expr(f"c_us div {bucket_us}"))
    return (
        left.join(right, "bucket")
        .filter(
            (F.col("c_us") >= F.col("t_us"))
            & (F.col("c_us") < F.col("t_us") + bucket_us)
        )
        .groupBy("error_id")
        .agg(F.count("*").alias("n_clicks_5min"))
    )


_RANGE_SQL = f"""
WITH e AS (
  SELECT event_id AS error_id, epoch_us(ts) AS t_us
  FROM events WHERE event_type = 'error'
),
c AS (SELECT epoch_us(ts) AS c_us FROM events WHERE event_type = 'click')
SELECT error_id, count(*)::BIGINT AS n_clicks_5min
FROM e JOIN c ON c_us >= t_us AND c_us < t_us + {_RANGE_S * 1_000_000}
GROUP BY error_id
"""


# ---------------------------------------------------------------------------
# time-range rolling window — per-user trailing-hour average
# ---------------------------------------------------------------------------

_ROLL_US = 3_600_000_000  # 1 hour in microseconds


def events_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-1-hour rolling mean/count over event values — the
    RANGE-frame window (time-based, not row-based) the reference's serial
    loop cannot express at all.

    Both engines order on epoch MICROseconds (not seconds) so frame
    boundaries agree exactly even for sub-second timestamps; RANGE frames
    treat equal-key rows as peers identically in Spark and DuckDB. One
    shuffle on user_id (uniform keys); the frame is evaluated with a
    sliding aggregator, not a per-row rescan.
    """
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").withColumn(
        "t_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-_ROLL_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.round(F.avg("value").over(w) + 1e-9, 4).alias("avg_1h"),
    )


_ROLLING_SQL = f"""
SELECT event_id, user_id,
       count(*) OVER w::BIGINT AS n_1h,
       round(avg(value) OVER w + 1e-9, 4) AS avg_1h
FROM (SELECT *, epoch_us(ts) AS t_us FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY t_us
             RANGE BETWEEN {_ROLL_US} PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# CUBE — all grouping-set combinations of (order year, priority)
# ---------------------------------------------------------------------------

def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order totals cubed over (order year, priority): every grouping-set
    combination — (year, prio), (year), (prio), () — in ONE pass.

    Complements ``rollup_revenue`` (hierarchical subsets) with the full
    cross of subtotals; Catalyst expands the cube into a single Expand +
    hash aggregate, so the input is scanned once regardless of how many
    grouping sets — at 10^12 rows that is 4x cheaper than 4 separate
    aggregations unioned.
    """
    orders = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.col("o_orderpriority").alias("prio"),
            cents.alias("cents"),
        )
        .cube("yr", "prio")
        .agg(F.sum("cents").alias("revenue_cents"), F.count("*").alias("n_orders"))
        .select(
            F.coalesce(F.col("yr"), F.lit(-1)).alias("yr"),
            F.coalesce(F.col("prio"), F.lit("ALL")).alias("prio"),
            "revenue_cents",
            "n_orders",
        )
    )


_CUBE_SQL = """
SELECT coalesce(year(o_orderdate), -1)::INTEGER AS yr,
       coalesce(o_orderpriority, 'ALL') AS prio,
       sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS revenue_cents,
       count(*)::BIGINT AS n_orders
FROM orders GROUP BY CUBE (year(o_orderdate), o_orderpriority)
"""


# ---------------------------------------------------------------------------
# snapshot diff — incremental-rollup delta between two table snapshots
# ---------------------------------------------------------------------------

_SNAP_T1 = "2024-01-01 12:00:00"
_SNAP_T2 = "2024-01-20"


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta between per-user rollups at two snapshot cutoffs — the
    Iceberg-snapshot incremental-maintenance shape: what a consumer that
    materialized the aggregate at T1 must apply to reach T2 (insert / update
    per key, with old and new values).

    Scale shape: both snapshots aggregate from ONE scan (conditional
    aggregation on the cutoff timestamps — no second pass, no self-join of
    raw events); the per-key diff is then a filter over the single
    aggregate, so the only shuffle is the groupBy on the uniform user key.
    At a real Iceberg table the T1..T2 slice would come from the snapshot
    log instead of a predicate — semantics identical.
    """
    ev = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    t1, t2 = F.lit(_SNAP_T1).cast("timestamp"), F.lit(_SNAP_T2).cast("timestamp")
    agg = (
        ev.filter(F.col("ts") < t2)
        .groupBy("user_id")
        .agg(
            F.sum((F.col("ts") < t1).cast("long")).alias("n_a"),
            F.count("*").alias("n_b"),
        )
    )
    return (
        agg.filter(F.col("n_b") != F.col("n_a"))
        .select(
            "user_id",
            "n_a",
            "n_b",
            F.when(F.col("n_a") == 0, F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("change_type"),
        )
    )


_SNAPSHOT_DIFF_SQL = f"""
WITH agg AS (
  SELECT user_id,
         sum(CASE WHEN ts < TIMESTAMP '{_SNAP_T1}' THEN 1 ELSE 0 END)::BIGINT
             AS n_a,
         count(*)::BIGINT AS n_b
  FROM events WHERE ts < TIMESTAMP '{_SNAP_T2}'
  GROUP BY user_id
)
SELECT user_id, n_a, n_b,
       CASE WHEN n_a = 0 THEN 'insert' ELSE 'update' END AS change_type
FROM agg WHERE n_b != n_a
"""


# ---------------------------------------------------------------------------
# lag/lead inter-arrival deltas — per-user event-gap profile
# ---------------------------------------------------------------------------

def events_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG window over (user, time): inter-event gaps per user, reduced to an
    integer-only profile (microsecond gaps — no float rounding to drift
    between engines). Orders on (ts, event_id) so same-timestamp ties are
    deterministic. Scale: one shuffle on user_id for the window, then the
    groupBy reuses the same partitioning (no second exchange)."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = (
        ev.select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "event_id",
        )
        .withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            (F.count("*") + 1).alias("n_events"),
            F.max("gap_us").alias("max_gap_us"),
            F.sum("gap_us").alias("sum_gap_us"),
            F.sum((F.col("gap_us") > 3_600_000_000).cast("long")).alias(
                "n_big_gaps"
            ),
        )
        .orderBy("user_id")
    )


_LAG_DELTA_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id, (count(*) + 1)::BIGINT AS n_events,
       max(gap_us)::BIGINT AS max_gap_us,
       sum(gap_us)::BIGINT AS sum_gap_us,
       sum(CASE WHEN gap_us > 3600000000 THEN 1 ELSE 0 END)::BIGINT
           AS n_big_gaps
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# pivot — per-user event-type contingency as columns
# ---------------------------------------------------------------------------

_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an EXPLICIT value list — without it Spark runs a separate
    distinct job over the full table just to discover the columns (a silent
    extra scan at 100 TB). Counts are integer-only; absent cells coalesce
    to 0 in both engines."""
    ev = load(spark, sf_dir, "events")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in _PIVOT_TYPES
        ],
    ).orderBy("user_id")


_PIVOT_SQL = f"""
SELECT user_id,
       {", ".join(
           f"count(*) FILTER (event_type = '{t}')::BIGINT AS n_{t}"
           for t in _PIVOT_TYPES
       )}
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# cohort retention — weekly cohort × week-offset active-user matrix
# ---------------------------------------------------------------------------

def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: cohort_week = the week (since 2024-01-01) of
    a user's first event; n_users = distinct users from that cohort active
    week_offset weeks later.  Shaped for scale as ONE shuffle on user_id
    (min-week and the distinct active-week set in the same groupBy, then an
    explode — no events⋈firsts self-join, which would re-shuffle the full
    event log), and the second groupBy counts pre-deduplicated rows, so no
    countDistinct state."""
    ev = load(spark, sf_dir, "events")
    wk = F.floor(
        F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("2024-01-01"))) / 7
    )
    per_user = (
        ev.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(F.min("wk").alias("cohort_week"), F.collect_set("wk").alias("wks"))
    )
    exploded = per_user.select(
        "cohort_week", F.explode("wks").alias("wk")
    )
    return exploded.groupBy(
        F.col("cohort_week"),
        (F.col("wk") - F.col("cohort_week")).alias("week_offset"),
    ).agg(F.count("*").alias("n_users"))


_RETENTION_SQL = """
WITH w AS (
  SELECT DISTINCT user_id,
         (date_diff('day', DATE '2024-01-01', ts::DATE) // 7)::BIGINT AS wk
  FROM events
),
c AS (SELECT user_id, min(wk) AS cohort_week FROM w GROUP BY user_id)
SELECT c.cohort_week::BIGINT AS cohort_week,
       (w.wk - c.cohort_week)::BIGINT AS week_offset,
       count(*)::BIGINT AS n_users
FROM w JOIN c USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# skew-safe salted join — explicit salt-before-exchange enrichment
# ---------------------------------------------------------------------------

def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every event with its type-level max (integer cents — exact
    across engines) through ``salted_join``: the dim side is replicated 8×
    and fact rows scatter across the replicas by xxhash64(event_id), so a
    hot event_type's rows spread over 8 reducers instead of one.  The
    oracle is a plain join — salting must not change the result, only the
    shuffle layout."""
    from ..operators.partitioning import salted_join

    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    fact = ev.select("event_id", "event_type", cents.alias("cents"))
    dim = fact.groupBy("event_type").agg(F.max("cents").alias("max_cents"))
    joined = salted_join(fact, dim, key="event_type", row_key="event_id")
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("cents") == F.col("max_cents")).cast("long")).alias("n_at_max"),
        F.max("max_cents").alias("max_cents"),
    )


_SALTED_JOIN_SQL = """
WITH fact AS (
  SELECT event_id, event_type, round(value * 100, 0)::BIGINT AS cents
  FROM events
),
dim AS (SELECT event_type, max(cents) AS max_cents FROM fact GROUP BY event_type)
SELECT f.event_type,
       count(*)::BIGINT AS n_events,
       sum(CASE WHEN f.cents = d.max_cents THEN 1 ELSE 0 END)::BIGINT AS n_at_max,
       max(d.max_cents)::BIGINT AS max_cents
FROM fact f JOIN dim d USING (event_type)
GROUP BY f.event_type
"""


# ---------------------------------------------------------------------------
# global-quantile threshold filter — two-phase scalar-broadcast pattern
# ---------------------------------------------------------------------------

def quantile_threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source count of documents above the GLOBAL p90 of n_chars.  The
    scalar threshold is computed as a 1-row aggregate and broadcast into
    the second pass (crossJoin(broadcast(...)) — one plan, no driver-side
    collect), the shape every corpus-wide percentile cut takes at 100 TB:
    pass 1 reads only n_chars (column pruning), pass 2 streams with the
    threshold as a build-side literal."""
    docs = load(spark, sf_dir, "documents")
    thr = docs.agg(F.expr("percentile(n_chars, 0.9)").alias("p90"))
    joined = docs.select("source", "n_chars").crossJoin(F.broadcast(thr))
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("n_chars") > F.col("p90")).cast("long")).alias("n_above_p90"),
        F.round(F.max("p90") + 1e-9, 3).alias("p90"),
    )


_QUANTILE_THRESHOLD_SQL = """
WITH thr AS (SELECT quantile_cont(n_chars, 0.9) AS p90 FROM documents)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN n_chars > p90 THEN 1 ELSE 0 END)::BIGINT AS n_above_p90,
       round(max(p90) + 1e-9, 3) AS p90
FROM documents, thr
GROUP BY source
"""


# ---------------------------------------------------------------------------
# ntile deciles — equal-frequency binning (quality-score bucketing shape)
# ---------------------------------------------------------------------------

def value_deciles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(10) per event_type over ``value`` — the equal-frequency binning
    a corpus pipeline uses to bucket quality scores before per-bucket
    sampling.  Ties broken on event_id so both engines rank identically.
    Scale: one shuffle on event_type for the window; the groupBy reuses the
    same partitioning (decile boundaries are per-partition local after the
    window sort, no second wide exchange of raw rows)."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", "event_id")
        .withColumn("decile", F.ntile(10).over(w))
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.min("value") + 1e-9, 6).alias("lo"),
            F.round(F.max("value") + 1e-9, 6).alias("hi"),
        )
        .orderBy("event_type", "decile")
    )


_DECILES_SQL = """
SELECT event_type, decile,
       count(*)::BIGINT AS n_events,
       round(min(value) + 1e-9, 6) AS lo,
       round(max(value) + 1e-9, 6) AS hi
FROM (
  SELECT event_type, value, event_id,
         ntile(10) OVER (PARTITION BY event_type
                         ORDER BY value, event_id) AS decile
  FROM events
)
GROUP BY event_type, decile
ORDER BY event_type, decile
"""


# ---------------------------------------------------------------------------
# interval attribution join — batch oracle for the stream-stream join
# ---------------------------------------------------------------------------

def events_interval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermarked stream-stream interval join (streaming/joins.py) run
    on batch inputs, where the SAME expression degrades to a plain
    conditional join (watermarks are no-ops) — so the join condition is
    oracle-checkable here while tests/test_stream_join.py pins the
    streaming execution (state eviction, late-row drop) of the identical
    operator.  Pairs every click with the views it follows within 1 hour
    for the same user."""
    from ..streaming.joins import interval_attribution_join

    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    pairs = interval_attribution_join(
        views, clicks, key="user_id", max_lag="1 hour", watermark="2 hours"
    )
    return pairs.select(
        "user_id",
        "base_event",
        "follow_event",
        F.col("f_ts").cast("long").alias("lag_anchor_s"),
    )


_INTERVAL_ATTR_SQL = """
WITH b AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
f AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
SELECT b.user_id,
       b.event_id AS base_event,
       f.event_id AS follow_event,
       floor(epoch(f.ts))::BIGINT AS lag_anchor_s
FROM b JOIN f
  ON b.user_id = f.user_id
 AND f.ts > b.ts
 AND f.ts <= b.ts + INTERVAL 1 HOUR
"""


QUERIES = {
    "events_interval_attribution": events_interval_attribution,
    "value_deciles_by_type": value_deciles_by_type,
    "quantile_sketch_check": quantile_sketch_check,
    "json_props_extract": json_props_extract,
    "rollup_revenue": rollup_revenue,
    "sessionize_events": sessionize_events,
    "value_percentiles": value_percentiles,
    "cohort_setops": cohort_setops,
    "cardinality_stats": cardinality_stats,
    "events_asof_join": events_asof_join,
    "events_range_join": events_range_join,
    "events_rolling_avg": events_rolling_avg,
    "cube_revenue": cube_revenue,
    "snapshot_diff": snapshot_diff,
    "events_lag_delta": events_lag_delta,
    "events_pivot_by_type": events_pivot_by_type,
    "value_histogram": value_histogram,
    "events_funnel": events_funnel,
    "cohort_retention": cohort_retention,
    "skew_salted_join": skew_salted_join,
    "quantile_threshold_filter": quantile_threshold_filter,
}

ORACLE = {
    "events_interval_attribution": _INTERVAL_ATTR_SQL,
    "value_deciles_by_type": _DECILES_SQL,
    "quantile_sketch_check": _QUANTILE_SKETCH_SQL,
    "events_funnel": _FUNNEL_SQL,
    "cohort_retention": _RETENTION_SQL,
    "skew_salted_join": _SALTED_JOIN_SQL,
    "quantile_threshold_filter": _QUANTILE_THRESHOLD_SQL,
    "events_lag_delta": _LAG_DELTA_SQL,
    "events_pivot_by_type": _PIVOT_SQL,
    "value_histogram": _HISTOGRAM_SQL,
    "json_props_extract": _JSON_PROPS_SQL,
    "rollup_revenue": _ROLLUP_SQL,
    "sessionize_events": _SESSIONIZE_SQL,
    "value_percentiles": _PERCENTILES_SQL,
    "cohort_setops": _COHORT_SQL,
    "cardinality_stats": _CARDINALITY_SQL,
    "events_asof_join": _ASOF_SQL,
    "events_range_join": _RANGE_SQL,
    "events_rolling_avg": _ROLLING_SQL,
    "cube_revenue": _CUBE_SQL,
    "snapshot_diff": _SNAPSHOT_DIFF_SQL,
}
