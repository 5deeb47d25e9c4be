"""Corpus-curation ops over ``documents``: deterministic train/valid/test
hash split, normalization pass, and per-rule quality ablation.

The three stages every training-data build runs between raw scrape and
tokenizer: (1) carve held-out splits by a content-stable hash so re-runs and
backfills never migrate a document across the eval boundary, (2) canonicalize
text (case/whitespace) before dedup so near-identical variants collide, and
(3) measure each quality rule's independent flag rate before wiring it into a
cascade (the cascade itself is P2, ``operators/cascade.py``).

Reference analogs: the split mirrors the reference's deterministic
name-derived routing (``wallaby2caom2/storage_name.py`` — identity from
content, not arrival order); the ablation mirrors its per-rule counters
(success/failure/retry sinks, ``config/config.yml:28-54``) measured
independently rather than post-cascade.

All pure Catalyst column expressions with DuckDB oracles. The split hash is
multiply-xor-shift over BIGINT kept under 2^52 so ANSI-mode Spark and DuckDB
compute identical values with no overflow on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._tables import load

# --------------------------------------------------------------------------
# deterministic train/valid/test split
# --------------------------------------------------------------------------

# multiply-xor-shift: doc_id is first folded mod 2^20 so the product stays
# < 2^52 (ANSI Spark would raise on BIGINT overflow; DuckDB would too).
# Knuth's multiplicative constant scrambles the low bits; the xor-shift mixes
# the high bits back down so consecutive ids don't stripe the buckets.
_FOLD = 1 << 20
_MULT = 2654435761  # 2^32 * golden-ratio conjugate, coprime to 2^20 and 1000
_BUCKETS = 1000
_TRAIN_LT, _VALID_LT = 980, 990  # 98 / 1 / 1 split


def _bucket_expr() -> F.Column:
    return F.expr(
        f"pmod(((doc_id % {_FOLD}) * {_MULT}) ^ "
        f"shiftright((doc_id % {_FOLD}) * {_MULT}, 16), {_BUCKETS})"
    )


def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split summary: per split, document count, char volume, share.

    Scale shape: one narrow projection + one partial-agg exchange of 3 rows;
    the split column would normally be WRITTEN as a partition column so every
    downstream trainer prunes to its split at the scan. No data-dependent
    skew: the hash is uniform over doc_id regardless of corpus layout. The
    share denominator is a window sum over the 3-row aggregate — one plan,
    no driver-side count action.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    split = (
        F.when(_bucket_expr() < _TRAIN_LT, F.lit("train"))
        .when(_bucket_expr() < _VALID_LT, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    agg = (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    total = F.sum("n_docs").over(Window.partitionBy())
    return agg.select(
        "split",
        "n_docs",
        "total_chars",
        F.round(F.col("n_docs") / total + 1e-9, 4).alias("share"),
    ).orderBy("split")


_SPLIT_SQL = f"""
WITH b AS (
  SELECT n_chars,
         ((doc_id % {_FOLD}) * {_MULT}) AS h
  FROM documents
), s AS (
  SELECT n_chars,
         CASE WHEN xor(h, h >> 16) % {_BUCKETS} < {_TRAIN_LT} THEN 'train'
              WHEN xor(h, h >> 16) % {_BUCKETS} < {_VALID_LT} THEN 'valid'
              ELSE 'test' END AS split
  FROM b
)
SELECT split, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars,
       round(count(*) / sum(count(*)) OVER () + 1e-9, 4) AS share
FROM s GROUP BY split ORDER BY split
"""


# --------------------------------------------------------------------------
# normalization pass
# --------------------------------------------------------------------------

def text_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization dry-run: lowercase + whitespace-collapse + trim,
    reported per source as how many documents would change and how many
    characters the collapse removes. Runs as one narrow projection + a
    per-source partial agg; at 100 TB the normalized text would be written
    back (or fed straight into the dedup shingler) in the same stage — the
    stats here are the observe step pipelines run before a destructive
    rewrite (same observe-before-patch pattern as ``plans/maintenance.py``).
    """
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    d = docs.select(
        "source",
        (norm != F.col("text")).cast("int").alias("changed"),
        (F.length("text") - F.length(norm)).alias("delta"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("changed").alias("n_changed"),
            F.sum("delta").alias("chars_removed"),
            F.round(F.avg("delta") + 1e-9, 4).alias("avg_chars_removed"),
        )
        .orderBy("source")
    )


_NORMALIZE_SQL = r"""
WITH n AS (
  SELECT source, text,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN norm <> text THEN 1 ELSE 0 END)::BIGINT AS n_changed,
       sum(len(text) - len(norm))::BIGINT AS chars_removed,
       round(avg(len(text) - len(norm)) + 1e-9, 4) AS avg_chars_removed
FROM n GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# per-rule quality ablation
# --------------------------------------------------------------------------

_ABLATION_RULES = "'too_short', r_short, 'digit_heavy', r_digit, " \
                  "'caps_heavy', r_caps, 'punct_heavy', r_punct"

# character classes as translate() deletion sets: counting class members via
# length(text) - length(translate(text, set, '')) is a single non-regex pass
# — measured 32x faster than length(regexp_replace(text, class, '')) at 200k
# docs/local[32] (1.3s vs 42s), because java.util.regex builds a result
# string per row. " \t\n\r\x0b\x0c" spells out Java regex \s exactly, so the
# punct rule keeps its original "not alnum, not whitespace" meaning.
_DIGITS = "0123456789"
_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ALNUM_WS = _UPPER + _UPPER.lower() + _DIGITS + " \t\n\r\x0b\x0c"


def _class_count(keep: str) -> F.Column:
    return F.length("text") - F.length(F.translate("text", keep, ""))


def quality_rule_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independent flag rate per quality rule — the measurement a curation
    team runs BEFORE ordering rules into a first-match cascade (P2). Each
    rule is evaluated on every document (no short-circuit), so the output is
    the marginal cost of each rule alone.

    Plan shape: ONE scan, one row of conditional sums, unpivoted to
    (rule, n_flagged, flag_pct) driver-side via ``stack`` — no union of
    scans, no re-read per rule. Character-class counting is translate()
    arithmetic, not regex (see _class_count) — 1M docs profile at
    local[32] in ~1.5s. At 100 TB this is the cheapest possible shape:
    a single non-regex pass producing a 4-row relation.
    """
    docs = load(spark, sf_dir, "documents")
    digits = _class_count(_DIGITS)
    caps = _class_count(_UPPER)
    punct = F.length(F.translate("text", _ALNUM_WS, ""))
    flags = docs.select(
        (F.col("n_chars") < 200).cast("long").alias("f_short"),
        (digits > F.col("n_chars") * 0.10).cast("long").alias("f_digit"),
        (caps > F.col("n_chars") * 0.15).cast("long").alias("f_caps"),
        (punct > F.col("n_chars") * 0.05).cast("long").alias("f_punct"),
    )
    agg = flags.agg(
        F.count("*").alias("n_total"),
        F.sum("f_short").alias("r_short"),
        F.sum("f_digit").alias("r_digit"),
        F.sum("f_caps").alias("r_caps"),
        F.sum("f_punct").alias("r_punct"),
    )
    return (
        agg.select(
            F.expr(f"stack(4, {_ABLATION_RULES}) AS (rule, n_flagged)"),
            "n_total",
        )
        .select(
            "rule",
            "n_flagged",
            F.round(F.col("n_flagged") / F.col("n_total") + 1e-9, 4).alias(
                "flag_pct"
            ),
        )
        .orderBy("rule")
    )


_ABLATION_SQL = f"""
WITH f AS (
  SELECT count(*)::BIGINT AS n_total,
    sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END)::BIGINT AS r_short,
    sum(CASE WHEN len(text) - len(translate(text, '{_DIGITS}', ''))
             > n_chars * 0.10 THEN 1 ELSE 0 END)::BIGINT AS r_digit,
    sum(CASE WHEN len(text) - len(translate(text, '{_UPPER}', ''))
             > n_chars * 0.15 THEN 1 ELSE 0 END)::BIGINT AS r_caps,
    sum(CASE WHEN len(translate(text,
          '{_UPPER}{_UPPER.lower()}{_DIGITS} '
          || chr(9) || chr(10) || chr(13) || chr(11) || chr(12), ''))
             > n_chars * 0.05 THEN 1 ELSE 0 END)::BIGINT AS r_punct
  FROM documents
), u AS (
  SELECT 'too_short' AS rule, r_short AS n_flagged, n_total FROM f
  UNION ALL SELECT 'digit_heavy', r_digit, n_total FROM f
  UNION ALL SELECT 'caps_heavy', r_caps, n_total FROM f
  UNION ALL SELECT 'punct_heavy', r_punct, n_total FROM f
)
SELECT rule, n_flagged, round(n_flagged / n_total::DOUBLE + 1e-9, 4)
         AS flag_pct
FROM u ORDER BY rule
"""


QUERIES = {
    "split_train_valid_test": split_train_valid_test,
    "text_normalize_stats": text_normalize_stats,
    "quality_rule_ablation": quality_rule_ablation,
}

ORACLE = {
    "split_train_valid_test": _SPLIT_SQL,
    "text_normalize_stats": _NORMALIZE_SQL,
    "quality_rule_ablation": _ABLATION_SQL,
}
