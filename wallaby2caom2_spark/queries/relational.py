"""SURVEY.md §2 relational operator analogs over the TPC-H-ish test tables.

Each query re-expresses one reference behavior as idiomatic Catalyst
DataFrame code, with a DuckDB oracle. Cross-engine float determinism: money
sums use the exact cents-BIGINT pattern (per-row ``round(x*100)::bigint``,
integer sum) so value-hashes match bit-for-bit regardless of summation order.

Reference citations per query:
- doc_rule_cascade: first-match-wins product-type cascade,
  ``wallaby2caom2/storage_name.py:101-114`` / ``main_app.py:170-184``.
- rejected_anti_join: rejected-known-failures exclusion (J3),
  ``config/config.yml:56-60``.
- retry_anti_join: retry/todo selection (J4), ``config/config.yml:38-41``.
- name_derivation: StorageName derived naming (P8-P12),
  ``wallaby2caom2/storage_name.py:129-176``.
- value_repair_scrub: declarative value repair (P15),
  ``wallaby2caom2/main_app.py:84-96``.
- latest_event_per_user: per-key dedup ranking (§2.5 window note).
- hourly_event_rollup: time-boxed incremental chunks (S12/A4),
  ``config/config.yml:67-71``.
- pricing_summary / revenue_per_nation: metrics-style hash aggregation
  (A1/A5) at TPC-H Q1/Q5 shape — the bench headline queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..colexpr import cents as _cents
from ._tables import load

ALLOWED_DOC_LANGS = ("en", "fr", "de", "es")


# ---------------------------------------------------------------------------
# P2 analog — first-match-wins rule cascade (whole-stage codegen, no UDF)
# ---------------------------------------------------------------------------

def doc_rule_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    d = docs.withColumn("n_words", F.size(words)).withColumn(
        "n_distinct", F.size(F.array_distinct(words))
    )
    rep = 1.0 - F.col("n_distinct") / F.col("n_words")
    outcome = (
        F.when(F.col("n_chars") < 100, F.lit("too_short"))
        .when(F.col("n_chars") > 450, F.lit("too_long"))
        .when(~F.col("lang").isin(*ALLOWED_DOC_LANGS), F.lit("lang_not_allowed"))
        .when(rep > 0.65, F.lit("repetition"))
        .otherwise(F.lit("kept"))
    )
    return (
        d.withColumn("outcome", outcome)
        .groupBy("outcome")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars") + 1e-9, 4).alias("avg_chars"),
        )
    )


_DOC_RULE_CASCADE_SQL = """
WITH w AS (
  SELECT *, string_split_regex(trim(text), '\\s+') AS words FROM documents
), c AS (
  SELECT n_chars, lang,
         1.0 - len(list_distinct(words))::DOUBLE / len(words) AS rep
  FROM w
)
SELECT CASE WHEN n_chars < 100 THEN 'too_short'
            WHEN n_chars > 450 THEN 'too_long'
            WHEN lang NOT IN ('en','fr','de','es') THEN 'lang_not_allowed'
            WHEN rep > 0.65 THEN 'repetition'
            ELSE 'kept' END AS outcome,
       count(*)::BIGINT AS n_docs,
       round(avg(n_chars) + 1e-9, 4) AS avg_chars
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# A1/A5 analog — TPC-H Q1-shaped hash aggregation (bench headline q1)
# ---------------------------------------------------------------------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_price_cents"),
            F.sum(_cents(disc_price)).alias("sum_disc_price_cents"),
            F.round(F.avg("l_quantity") + 1e-9, 4).alias("avg_qty"),
            F.round(F.avg("l_discount") + 1e-9, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
       sum(round(l_extendedprice*100, 0)::BIGINT)::BIGINT AS sum_base_price_cents,
       sum(round(l_extendedprice*(1-l_discount)*100, 0)::BIGINT)::BIGINT
           AS sum_disc_price_cents,
       round(avg(l_quantity) + 1e-9, 4) AS avg_qty,
       round(avg(l_discount) + 1e-9, 4) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# J3 analog — broadcast left-anti "rejected list" exclusion
# ---------------------------------------------------------------------------

def rejected_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    rejected = cust.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    return (
        cust.join(F.broadcast(rejected), "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum(_cents(F.col("c_acctbal"))).alias("sum_bal_cents"),
        )
    )


_REJECTED_ANTI_JOIN_SQL = """
SELECT c_mktsegment,
       count(*)::BIGINT AS n_kept,
       sum(round(c_acctbal*100, 0)::BIGINT)::BIGINT AS sum_bal_cents
FROM customer
WHERE c_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# J4 analog — retry/todo selection: inputs anti-join the "done" set
# ---------------------------------------------------------------------------

def retry_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    done = (
        li.filter(F.col("l_shipdate") >= F.lit("2001-06-01").cast("timestamp"))
        .select(F.col("l_partkey").alias("p_partkey"))
        .distinct()
    )
    return (
        part.join(done, "p_partkey", "left_anti")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_pending"))
    )


_RETRY_ANTI_JOIN_SQL = """
SELECT p_brand, count(*)::BIGINT AS n_pending
FROM part
WHERE p_partkey NOT IN (
  SELECT DISTINCT l_partkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '2001-06-01')
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# A1/A2 analog — multi-way star join with broadcast dims (bench headline q2)
# ---------------------------------------------------------------------------

def revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(rev).alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


_REVENUE_PER_NATION_SQL = """
SELECT r_name AS region, n_name AS nation,
       sum(round(l_extendedprice*(1-l_discount)*100, 0)::BIGINT)::BIGINT
           AS revenue_cents,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# §2.5 window analog — per-key dedup ranking (latest event wins)
# ---------------------------------------------------------------------------

def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            _cents(F.col("value")).alias("value_cents"),
        )
    )


_LATEST_EVENT_SQL = """
SELECT user_id, event_id, event_type,
       round(value*100, 0)::BIGINT AS value_cents
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


# ---------------------------------------------------------------------------
# S12/A4 analog — time-boxed rollup (incremental-batch chunk accounting)
# ---------------------------------------------------------------------------

def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("hour", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00"))
        .groupBy("hour", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("sum_value_cents"),
        )
    )


_HOURLY_ROLLUP_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, event_type,
       count(*)::BIGINT AS n_events,
       sum(round(value*100, 0)::BIGINT)::BIGINT AS sum_value_cents
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# P8-P12 analog — StorageName-style derived naming, pure column expressions
# ---------------------------------------------------------------------------

def name_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.element_at(toks, -2).alias("version_token"),
        F.size(toks).alias("n_tokens"),
        F.concat_ws("_", F.element_at(toks, 1), F.element_at(toks, 2)).alias("obs_id"),
        F.concat(F.regexp_replace("p_name", " ", "_"), F.lit("_prev_256.png")).alias(
            "thumb_name"
        ),
    )


_NAME_DERIVATION_SQL = """
WITH t AS (SELECT *, string_split(p_name, ' ') AS toks FROM part)
SELECT p_partkey,
       toks[1] AS first_token,
       toks[len(toks)] AS last_token,
       toks[len(toks)-1] AS version_token,
       len(toks)::INTEGER AS n_tokens,
       concat(toks[1], '_', toks[2]) AS obs_id,
       concat(replace(p_name, ' ', '_'), '_prev_256.png') AS thumb_name
FROM t
"""


# ---------------------------------------------------------------------------
# P9 full — the reference's most intricate naming rule, end to end
# ---------------------------------------------------------------------------

def product_id_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full P9 (``wallaby2caom2/storage_name.py:145-167`` set_product_id):
    tokenize on '_', conditionally remove the FIRST 'Kin' token (only when
    no 'High-Res' token), slice ``[2:-3]`` when a 'prev' token is present
    else ``[2:-1]``, then prefix by suffix-class ('source_data_' when the
    file_id carries a _cube/_mom/_chan/_mask/_snr/_spec marker, else
    'kinematic_model_'); 'SoFiA' names pass through unchanged.

    WALLABY-shaped file_ids are synthesized deterministically from
    p_partkey (identically in the oracle) so every branch is exercised.
    Pure codegen — split/slice/array_position higher-order exprs, no UDF."""
    part = load(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    s = pk.cast("string")
    file_id = (
        F.when(pk % 5 == 0, F.concat(F.lit("SoFiA_J"), s, F.lit("_cube")))
        .when(pk % 5 == 1, F.concat(F.lit("WALLABY_J"), s, F.lit("_Kin_TR2_cube_v02")))
        .when(
            pk % 5 == 2,
            F.concat(F.lit("WALLABY_J"), s, F.lit("_High-Res_Kin_model_v01")),
        )
        .when(
            pk % 5 == 3,
            F.concat(F.lit("WALLABY_J"), s, F.lit("_Kin_model_prev_256_v01")),
        )
        .otherwise(F.concat(F.lit("WALLABY_J"), s, F.lit("_mom0_v03")))
    )
    df = part.select("p_partkey", file_id.alias("file_id")).withColumn(
        "toks0", F.split("file_id", "_")
    )
    kin = "array_position(toks0, 'Kin')"
    df = df.withColumn(
        "toks",
        F.expr(
            f"""CASE WHEN array_contains(toks0, 'Kin')
                          AND NOT array_contains(toks0, 'High-Res')
                     THEN concat(slice(toks0, 1, {kin} - 1),
                                 slice(toks0, {kin} + 1, size(toks0) - {kin}))
                     ELSE toks0 END"""
        ),
    )
    fans = F.expr(
        """CASE WHEN array_contains(toks, 'prev')
                THEN array_join(slice(toks, 3, greatest(size(toks) - 5, 0)), '_')
                ELSE array_join(slice(toks, 3, greatest(size(toks) - 3, 0)), '_')
           END"""
    )
    is_source = (
        F.col("file_id").contains("_cube")
        | F.col("file_id").contains("_mom")
        | F.col("file_id").contains("_chan")
        | F.col("file_id").contains("_mask")
        | F.col("file_id").contains("_snr")
        | F.col("file_id").contains("_spec")
    )
    product_id = F.when(
        F.col("file_id").contains("SoFiA"), F.col("file_id")
    ).otherwise(
        F.concat(
            F.when(is_source, F.lit("source_data_")).otherwise(
                F.lit("kinematic_model_")
            ),
            fans,
        )
    )
    return df.select("p_partkey", "file_id", product_id.alias("product_id"))


_PRODUCT_ID_SQL = """
WITH base AS (
  SELECT p_partkey,
         CASE p_partkey % 5
           WHEN 0 THEN 'SoFiA_J' || p_partkey::VARCHAR || '_cube'
           WHEN 1 THEN 'WALLABY_J' || p_partkey::VARCHAR || '_Kin_TR2_cube_v02'
           WHEN 2 THEN 'WALLABY_J' || p_partkey::VARCHAR || '_High-Res_Kin_model_v01'
           WHEN 3 THEN 'WALLABY_J' || p_partkey::VARCHAR || '_Kin_model_prev_256_v01'
           ELSE 'WALLABY_J' || p_partkey::VARCHAR || '_mom0_v03'
         END AS file_id
  FROM part
), tok AS (
  SELECT *, string_split(file_id, '_') AS toks0 FROM base
), kin AS (
  SELECT *,
         CASE WHEN list_contains(toks0, 'Kin')
                   AND NOT list_contains(toks0, 'High-Res')
              THEN toks0[1:list_position(toks0, 'Kin')-1]
                   || toks0[list_position(toks0, 'Kin')+1:len(toks0)]
              ELSE toks0 END AS toks
  FROM tok
), f AS (
  SELECT *,
         CASE WHEN list_contains(toks, 'prev')
              THEN array_to_string(toks[3:len(toks)-3], '_')
              ELSE array_to_string(toks[3:len(toks)-1], '_') END AS fans
  FROM kin
)
SELECT p_partkey, file_id,
       CASE WHEN contains(file_id, 'SoFiA') THEN file_id
            ELSE (CASE WHEN contains(file_id, '_cube') OR contains(file_id, '_mom')
                            OR contains(file_id, '_chan') OR contains(file_id, '_mask')
                            OR contains(file_id, '_snr') OR contains(file_id, '_spec')
                       THEN 'source_data_' ELSE 'kinematic_model_' END) || fans
       END AS product_id
FROM f
"""


# ---------------------------------------------------------------------------
# J5 — store-if-newer: mtime-compare conditional transfer selection
# ---------------------------------------------------------------------------

def store_if_newer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 (reference ``README.md:39-41``: store a file when the archive copy
    is missing or older than the local one). Local side = latest activity
    per user; remote side = the archive's stale view (non-click events).
    Both aggregations shuffle on user_id, so the left join is co-partitioned
    — no extra exchange; missing-remote rows surface as 'store_new'."""
    ev = load(spark, sf_dir, "events")
    local = ev.groupBy("user_id").agg(F.max("ts").alias("local_mtime"))
    remote = (
        ev.filter(F.col("event_type") != "click")
        .groupBy("user_id")
        .agg(F.max("ts").alias("remote_mtime"))
    )
    out = local.join(remote, "user_id", "left").filter(
        F.col("remote_mtime").isNull()
        | (F.col("local_mtime") > F.col("remote_mtime"))
    )
    return out.select(
        "user_id",
        F.date_format("local_mtime", "yyyy-MM-dd HH:mm:ss").alias("local_mtime_s"),
        F.coalesce(
            F.date_format("remote_mtime", "yyyy-MM-dd HH:mm:ss"), F.lit("missing")
        ).alias("remote_mtime_s"),
        F.when(F.col("remote_mtime").isNull(), F.lit("store_new"))
        .otherwise(F.lit("store_newer"))
        .alias("action"),
    )


_STORE_IF_NEWER_SQL = """
WITH local AS (
  SELECT user_id, max(ts) AS local_mtime FROM events GROUP BY user_id
), remote AS (
  SELECT user_id, max(ts) AS remote_mtime FROM events
  WHERE event_type <> 'click' GROUP BY user_id
)
SELECT l.user_id,
       strftime(l.local_mtime, '%Y-%m-%d %H:%M:%S') AS local_mtime_s,
       coalesce(strftime(r.remote_mtime, '%Y-%m-%d %H:%M:%S'), 'missing')
           AS remote_mtime_s,
       CASE WHEN r.user_id IS NULL THEN 'store_new' ELSE 'store_newer' END
           AS action
FROM local l LEFT JOIN remote r USING (user_id)
WHERE r.user_id IS NULL OR l.local_mtime > r.remote_mtime
"""


# ---------------------------------------------------------------------------
# P15 analog — declarative value-repair / scrub chain (ordered regex table)
# ---------------------------------------------------------------------------

def value_repair_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    s1 = F.regexp_replace(F.col("text"), r"\bthe\b", "[THE]")
    s2 = F.regexp_replace(s1, r"\ba\b", "[A]")
    s3 = F.regexp_replace(s2, r"\s+", " ")
    edits = F.regexp_count(F.col("text"), F.lit(r"\bthe\b")) + F.regexp_count(
        F.col("text"), F.lit(r"\ba\b")
    )
    return docs.select(
        "doc_id",
        F.md5(s3).alias("scrub_fp"),
        edits.cast("int").alias("scrub_edits"),
    )


_VALUE_REPAIR_SQL = """
SELECT doc_id,
       md5(regexp_replace(
             regexp_replace(
               regexp_replace(text, '\\bthe\\b', '[THE]', 'g'),
               '\\ba\\b', '[A]', 'g'),
             '\\s+', ' ', 'g')) AS scrub_fp,
       (len(regexp_extract_all(text, '\\bthe\\b'))
        + len(regexp_extract_all(text, '\\ba\\b')))::INTEGER AS scrub_edits
FROM documents
"""


# ---------------------------------------------------------------------------
# top unshipped orders — the shipping-priority shape (multi-join + agg + top-k)
# ---------------------------------------------------------------------------

_SHIP_CUTOFF = "1998-06-15"


def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-filtered customer ⋈ orders ⋈ lineitem, revenue per order over
    lines still unshipped at the cutoff, top 10 by revenue (ties broken on
    o_orderkey so LIMIT is deterministic cross-engine). Scale shape: both
    date filters sit ON the scans (pushed to parquet row groups); customer
    is the small side and broadcasts so the only shuffle is the final
    per-order aggregation. Revenue in integer cents, the repo's exact-money
    convention."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_SHIP_CUTOFF).cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_SHIP_CUTOFF).cast("timestamp")
    )
    rev_cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev_cents).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("o_orderkey").asc())
        .limit(10)
        # format the date: a raw TimestampType collects in the DRIVER's OS
        # timezone while DuckDB returns naive wall time — the value-hash
        # would break on any non-UTC host (same convention as
        # store_if_newer / hourly_event_rollup)
        .withColumn(
            "o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd")
        )
    )


_TOP_UNSHIPPED_SQL = f"""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       sum(round(l_extendedprice * (1 - l_discount) * 100, 0))::BIGINT
           AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_SHIP_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{_SHIP_CUTOFF}'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# two-phase distinct aggregation — the skew-safe shape for COUNT(DISTINCT)
# ---------------------------------------------------------------------------

def distinct_users_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT user) per event_type, written as the explicit
    two-phase plan: dedupe on (event_type, user_id) FIRST — a combine-able
    aggregation whose map side shrinks each partition to its local distinct
    set — then count per type. A direct ``countDistinct`` over a hot key
    ships every raw row of that key to one reducer (the classic skew
    collapse at 10^12 rows); the pre-aggregation bounds the final shuffle at
    one row per (type, user) pair regardless of per-key row counts. Same
    result, skew-proof plan."""
    ev = load(spark, sf_dir, "events")
    pairs = ev.select("event_type", "user_id").distinct()
    return (
        pairs.groupBy("event_type")
        .agg(F.count("*").alias("n_users"))
        .orderBy("event_type")
    )


_TWO_PHASE_DISTINCT_SQL = """
SELECT event_type, count(*)::BIGINT AS n_users
FROM (SELECT DISTINCT event_type, user_id FROM events)
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# semi-join — EXISTS-subquery shape (priority count of orders with returns)
# ---------------------------------------------------------------------------

def orders_with_returns_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in 1996-H1 having at least one returned lineitem, counted per
    priority — the EXISTS-subquery shape expressed as a LEFT SEMI join
    (probe side deduplicates in the join itself; no distinct pass, no row
    multiplication from multi-lineitem orders).  Both filters sit below the
    join, so each parquet scan prunes to its predicate and the semi join
    ships only ``l_orderkey`` from the big side."""
    ords = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    returned = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        ords.join(returned, ords.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


_SEMI_JOIN_SQL = """
SELECT o_orderpriority, count(*)::BIGINT AS n_orders
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# decorrelated scalar subquery — per-key threshold (small-quantity revenue)
# ---------------------------------------------------------------------------

def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems whose quantity is below 20% of their part's
    average — the correlated-scalar-subquery shape, decorrelated by hand
    into a per-part aggregate joined back to the fact (what Catalyst's
    RewriteCorrelatedScalarSubquery does; written explicitly so the plan
    is one agg + one shuffle join, never a per-row subquery).  Quantities
    are integral doubles, so sum/avg are order-independent-exact and the
    0.2*avg threshold compares identically across engines; revenue is
    summed in integer cents."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        _cents(F.col("l_extendedprice")).alias("cents"),
    )
    thr = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_thr")
    )
    small = li.join(thr, on="l_partkey").filter(F.col("l_quantity") < F.col("qty_thr"))
    return small.agg(
        F.count("*").alias("n_small"),
        F.sum("cents").alias("revenue_cents"),
    )


_SMALL_QTY_SQL = """
WITH li AS (
  SELECT l_partkey, l_quantity,
         round(l_extendedprice * 100, 0)::BIGINT AS cents
  FROM lineitem
),
thr AS (
  SELECT l_partkey, avg(l_quantity) * 0.2 AS qty_thr
  FROM li GROUP BY l_partkey
)
SELECT count(*)::BIGINT AS n_small,
       sum(li.cents)::BIGINT AS revenue_cents
FROM li JOIN thr USING (l_partkey)
WHERE li.l_quantity < thr.qty_thr
"""


# ---------------------------------------------------------------------------
# double correlated subquery — EXISTS + NOT EXISTS (TPC-H Q21 shape)
# ---------------------------------------------------------------------------

_BLAME_TOPK = 20


def suppliers_sole_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for returns in multi-supplier orders —
    the TPC-H Q21 optimizer shape (adapted to this schema: "failed" :=
    ``l_returnflag = 'R'``): a returned lineitem counts against its
    supplier only when ANOTHER supplier participated in the same order
    (correlated EXISTS) and NO other supplier had a return in that order
    (correlated NOT EXISTS).

    Spark-first: the two correlated subqueries are a LEFT SEMI and a LEFT
    ANTI self-join of the slim (orderkey, suppkey, flag) projection — both
    hash-join on ``l_orderkey`` with the supplier inequality as a join-side
    residual, so neither degenerates to a cartesian product; the supplier
    dimension broadcasts. Deterministic top-k: (count desc, name asc).
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("s_key")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("b_okey"), F.col("l_suppkey").alias("b_skey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("c_okey"), F.col("l_suppkey").alias("c_skey")
    )
    blamed = (
        l1.join(
            l2,
            (F.col("o_key") == F.col("b_okey"))
            & (F.col("s_key") != F.col("b_skey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("o_key") == F.col("c_okey"))
            & (F.col("s_key") != F.col("c_skey")),
            "left_anti",
        )
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("s_key"), "s_name"
    )
    w = Window.orderBy(F.col("n_blamed").desc(), F.col("s_name").asc())
    return (
        blamed.groupBy("s_key")
        .agg(F.count("*").alias("n_blamed"))
        .join(F.broadcast(supp), "s_key")
        .orderBy(F.col("n_blamed").desc(), F.col("s_name").asc())
        .limit(_BLAME_TOPK)
        .select(
            "s_name",
            "n_blamed",
            F.row_number().over(w).alias("rk"),
        )
    )


_SOLE_BLAME_SQL = f"""
WITH blamed AS (
  SELECT l1.l_suppkey, count(*) AS n_blamed
  FROM lineitem l1
  WHERE l1.l_returnflag = 'R'
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_returnflag = 'R')
  GROUP BY l1.l_suppkey
)
SELECT s_name, n_blamed::BIGINT AS n_blamed,
       row_number() OVER (ORDER BY n_blamed DESC, s_name ASC)::INTEGER AS rk
FROM blamed JOIN supplier ON s_suppkey = l_suppkey
ORDER BY n_blamed DESC, s_name ASC LIMIT {_BLAME_TOPK}
"""


def min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each part, the supplier(s) offering the minimum price — the
    TPC-H Q2 correlated-MIN-with-equality-join-back shape (``WHERE price =
    (SELECT min(price) ... WHERE partkey = p.partkey)``), decorrelated by
    hand the way Catalyst's RewriteCorrelatedScalarSubquery would: a
    supplier-level offer aggregate, a per-part min over it, and an
    equi-join back on (partkey, offer) that keeps ALL tied argmin rows —
    tie semantics identical in both engines, values in exact integer
    cents.

    Scale shape: both aggregations partially combine map-side (the
    (l_partkey, l_suppkey) offer agg collapses lineitem ~30x before its
    exchange); the per-part best table is part-cardinality-sized and
    BROADCASTS back into the offers join — no shuffle join anywhere in
    the plan — and the supplier/nation dims broadcast too (verified:
    three BroadcastHashJoins, zero SortMergeJoins in docs/PLANS.md).

    Reference analog: the "pick the best candidate per key" selection of
    SURVEY.md §2.3 J5 (store-if-newer picks max-mtime; this picks the min
    offer and keeps ties)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", _cents(F.col("l_extendedprice")).alias("cents")
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("cents").alias("offer_cents")
    )
    # rename the re-aggregated key: best derives FROM offers, so a join
    # back on a same-named column would be a lineage-ambiguous self-join
    best = offers.groupBy(
        F.col("l_partkey").alias("best_partkey")
    ).agg(F.min("offer_cents").alias("best_cents"))
    # explicit hint: the docstring's no-shuffle-join claim must hold at any
    # scale factor, not just while `best` fits the auto-broadcast threshold
    winners = offers.join(
        F.broadcast(best),
        (F.col("l_partkey") == F.col("best_partkey"))
        & (F.col("offer_cents") == F.col("best_cents")),
    ).select("l_partkey", "l_suppkey", "offer_cents")
    sup = F.broadcast(load(spark, sf_dir, "supplier"))
    nat = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        winners.join(sup, winners.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            F.col("n_name").alias("nation"),
            "offer_cents",
        )
    )


_MIN_PRICE_SUPPLIER_SQL = """
WITH li AS (
  SELECT l_partkey, l_suppkey,
         round(l_extendedprice * 100, 0)::BIGINT AS cents
  FROM lineitem
),
offers AS (
  SELECT l_partkey, l_suppkey, min(cents)::BIGINT AS offer_cents
  FROM li GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, min(offer_cents) AS best_cents
  FROM offers GROUP BY l_partkey
)
SELECT o.l_partkey AS partkey, o.l_suppkey AS suppkey,
       s.s_name, n.n_name AS nation, o.offer_cents
FROM offers o
JOIN best b ON b.l_partkey = o.l_partkey AND o.offer_cents = b.best_cents
JOIN supplier s ON s.s_suppkey = o.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q7/Q8 analogs — bi-national trade volume and market share
# ---------------------------------------------------------------------------

_Q7_NATIONS = ("NATION_1", "NATION_2")
_Q7_YEARS = (1996, 1997)
_Q8_NATION = "NATION_3"
_Q8_REGION = "EUROPE"


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flowing between two nations (supplier side
    vs customer side), per direction per year. Exercises the double
    dimension-chain join — lineitem → supplier → nation on one side,
    lineitem → orders → customer → nation on the other — with both nation
    dims broadcast and the fact-to-fact links as hash equi-joins; the
    asymmetric pair filter (supp ≠ cust within the pair) prunes in codegen
    before the aggregation.

    Reference analog: the cross-provenance bookkeeping the reference never
    needed (single-source pipeline) — the standard warehouse join pattern
    a lakehouse user expects the engine to cover.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    n1, n2 = _Q7_NATIONS
    year = F.year("l_shipdate")
    j = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(
            F.broadcast(nat.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nat.select(
                F.col("n_nationkey").alias("cn_key"),
                F.col("n_name").alias("cust_nation"),
            )),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .filter(
            (
                (F.col("supp_nation") == n1) & (F.col("cust_nation") == n2)
                | (F.col("supp_nation") == n2) & (F.col("cust_nation") == n1)
            )
            & year.isin(*_Q7_YEARS)
        )
    )
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        j.groupBy("supp_nation", "cust_nation", year.alias("l_year"))
        .agg(F.sum(rev).alias("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_VOLUME_SHIPPING_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate)::INTEGER AS l_year,
       sum(round(l_extendedprice*(1-l_discount)*100, 0)::BIGINT)::BIGINT
         AS revenue_cents
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = '{_Q7_NATIONS[0]}' AND cn.n_name = '{_Q7_NATIONS[1]}')
    OR (sn.n_name = '{_Q7_NATIONS[1]}' AND cn.n_name = '{_Q7_NATIONS[0]}'))
  AND year(l_shipdate) IN ({", ".join(str(y) for y in _Q7_YEARS)})
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of the revenue sold
    into a region, per year — the conditional-aggregation-over-a-join
    pattern (share = SUM(CASE WHEN nation THEN rev END) / SUM(rev)) that
    avoids a second scan or a self-join. Share divides two exact cents
    sums, rounded at the handoff (the registry-wide money rule).
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    year = F.year("o_orderdate")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(
                nat.select("n_nationkey", "n_regionkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(
            F.broadcast(nat.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .filter(
            (F.col("r_name") == _Q8_REGION) & year.isin(*_Q7_YEARS)
        )
    )
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = j.groupBy(year.alias("o_year")).agg(
        F.sum(rev).alias("total_cents"),
        F.sum(
            F.when(F.col("supp_nation") == _Q8_NATION, rev).otherwise(0)
        ).alias("nation_cents"),
    )
    return agg.select(
        "o_year",
        "total_cents",
        "nation_cents",
        F.round(
            F.col("nation_cents") / F.col("total_cents") + 1e-9, 6
        ).alias("mkt_share"),
    ).orderBy("o_year")


_MARKET_SHARE_SQL = f"""
WITH j AS (
  SELECT year(o_orderdate)::INTEGER AS o_year,
         round(l_extendedprice*(1-l_discount)*100, 0)::BIGINT AS rev,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = '{_Q8_REGION}'
    AND year(o_orderdate) IN ({", ".join(str(y) for y in _Q7_YEARS)})
),
agg AS (
  SELECT o_year, sum(rev)::BIGINT AS total_cents,
         sum(CASE WHEN supp_nation = '{_Q8_NATION}' THEN rev ELSE 0 END)
           ::BIGINT AS nation_cents
  FROM j GROUP BY o_year
)
SELECT o_year, total_cents, nation_cents,
       round(nation_cents / total_cents::DOUBLE + 1e-9, 6) AS mkt_share
FROM agg ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q13/Q19 analogs — outer-join distribution and disjunctive pushdown
# ---------------------------------------------------------------------------

_Q13_EXCLUDED_PRIORITY = "1-URGENT"


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of order COUNTS per customer,
    INCLUDING the zero-order customers — the pattern that forces a LEFT
    OUTER join (an inner join silently drops the zero bucket, the classic
    Q13 bug) followed by a double aggregation, with the order-side filter
    applied BEFORE the join (on the join's right side, where it prunes;
    after the join it would turn legitimate matches into fake zeros).
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != _Q13_EXCLUDED_PRIORITY
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_CUST_DIST_SQL = f"""
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '{_Q13_EXCLUDED_PRIORITY}'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


_Q19_ARMS = (
    ("Brand#12", 1, 15, 1.0, 11.0),
    ("Brand#23", 1, 25, 10.0, 20.0),
    ("Brand#34", 1, 35, 20.0, 30.0),
)


def brand_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    both join sides (brand+size from part, quantity from lineitem). The
    plan property that matters: the part-side sub-predicates (brand IN,
    size ≤ max) are implied by the disjunction and push into the
    broadcast-side scan, so the join probes a pre-filtered dim while the
    full disjunction evaluates in codegen after the join — not a filter
    on a cartesian.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    arm = None
    for brand, lo_sz, hi_sz, lo_q, hi_q in _Q19_ARMS:
        a = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(lo_sz, hi_sz)
            & F.col("l_quantity").between(lo_q, hi_q)
        )
        arm = a if arm is None else (arm | a)
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(
            F.broadcast(
                part.filter(
                    F.col("p_brand").isin([a[0] for a in _Q19_ARMS])
                )
            ),
            li.l_partkey == part.p_partkey,
        )
        .filter(arm)
        .agg(
            F.sum(rev).alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


def _q19_arm_sql(a) -> str:
    brand, lo_sz, hi_sz, lo_q, hi_q = a
    return (
        f"(p_brand = '{brand}' AND p_size BETWEEN {lo_sz} AND {hi_sz}"
        f" AND l_quantity BETWEEN {lo_q} AND {hi_q})"
    )


_BRAND_PROMO_SQL = f"""
SELECT sum(round(l_extendedprice*(1-l_discount)*100, 0)::BIGINT)::BIGINT
         AS revenue_cents,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE {" OR ".join(_q19_arm_sql(a) for a in _Q19_ARMS)}
"""


# ---------------------------------------------------------------------------
# TPC-H Q16/Q22 analogs — distinct-supplier variety and idle-customer value
# ---------------------------------------------------------------------------

_Q16_EXCLUDED_BRAND = "Brand#5"


def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many DISTINCT suppliers ship each (brand,
    size) slice — supplier-diversity reporting. The distinct aggregate
    runs on the (partkey, suppkey) pairs observed in lineitem joined to a
    broadcast-pruned part dim; a brand exclusion prunes that dim before
    the join.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        F.col("p_brand") != _Q16_EXCLUDED_BRAND
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_size").asc(),
        )
    )


_PART_VARIETY_SQL = f"""
SELECT p_brand, p_size, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{_Q16_EXCLUDED_BRAND}'
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_size ASC
"""


_Q22_RECENT_CUTOFF = "2001-01-01"


def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average account balance and
    NO RECENT order (none since ``_Q22_RECENT_CUTOFF``) — the
    lapsed-high-value-customer report. Two classic pieces: a decorrelated
    scalar subquery (the average over positive balances, computed once
    and crossed in as a 1-row broadcast, never per-row) and a LEFT ANTI
    join against the recent orders for the NOT EXISTS, with the recency
    predicate pushed into the orders scan.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _Q22_RECENT_CUTOFF
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    idle = cust.join(
        orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_anti",
    )
    seg = F.col("c_mktsegment")
    return (
        idle.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy(seg.alias("mktsegment"))
        .agg(
            F.count("*").alias("n_custs"),
            F.sum(_cents(F.col("c_acctbal"))).alias("total_bal_cents"),
        )
        .orderBy("mktsegment")
    )


_IDLE_CUSTOMER_SQL = f"""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment AS mktsegment, count(*)::BIGINT AS n_custs,
       sum(round(c_acctbal * 100, 0)::BIGINT)::BIGINT AS total_bal_cents
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= '{_Q22_RECENT_CUTOFF}')
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "min_price_supplier": min_price_supplier,
    "orders_with_returns_semi": orders_with_returns_semi,
    "suppliers_sole_blame": suppliers_sole_blame,
    "small_quantity_revenue": small_quantity_revenue,
    "doc_rule_cascade": doc_rule_cascade,
    "pricing_summary": pricing_summary,
    "rejected_anti_join": rejected_anti_join,
    "retry_anti_join": retry_anti_join,
    "revenue_per_nation": revenue_per_nation,
    "latest_event_per_user": latest_event_per_user,
    "hourly_event_rollup": hourly_event_rollup,
    "name_derivation": name_derivation,
    "product_id_derivation": product_id_derivation,
    "store_if_newer": store_if_newer,
    "value_repair_scrub": value_repair_scrub,
    "top_unshipped_orders": top_unshipped_orders,
    "distinct_users_two_phase": distinct_users_two_phase,
    "volume_shipping": volume_shipping,
    "market_share": market_share,
    "customer_order_distribution": customer_order_distribution,
    "brand_promo_revenue": brand_promo_revenue,
    "part_supplier_variety": part_supplier_variety,
    "idle_customer_balance": idle_customer_balance,
}

ORACLE = {
    "volume_shipping": _VOLUME_SHIPPING_SQL,
    "market_share": _MARKET_SHARE_SQL,
    "customer_order_distribution": _CUST_DIST_SQL,
    "brand_promo_revenue": _BRAND_PROMO_SQL,
    "part_supplier_variety": _PART_VARIETY_SQL,
    "idle_customer_balance": _IDLE_CUSTOMER_SQL,
    "min_price_supplier": _MIN_PRICE_SUPPLIER_SQL,
    "orders_with_returns_semi": _SEMI_JOIN_SQL,
    "suppliers_sole_blame": _SOLE_BLAME_SQL,
    "small_quantity_revenue": _SMALL_QTY_SQL,
    "top_unshipped_orders": _TOP_UNSHIPPED_SQL,
    "distinct_users_two_phase": _TWO_PHASE_DISTINCT_SQL,
    "doc_rule_cascade": _DOC_RULE_CASCADE_SQL,
    "pricing_summary": _PRICING_SUMMARY_SQL,
    "rejected_anti_join": _REJECTED_ANTI_JOIN_SQL,
    "retry_anti_join": _RETRY_ANTI_JOIN_SQL,
    "revenue_per_nation": _REVENUE_PER_NATION_SQL,
    "latest_event_per_user": _LATEST_EVENT_SQL,
    "hourly_event_rollup": _HOURLY_ROLLUP_SQL,
    "name_derivation": _NAME_DERIVATION_SQL,
    "product_id_derivation": _PRODUCT_ID_SQL,
    "store_if_newer": _STORE_IF_NEWER_SQL,
    "value_repair_scrub": _VALUE_REPAIR_SQL,
}
