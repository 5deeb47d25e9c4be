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


# --------------------------------------------------------------------------
# Gopher-style document rule cascade (Rae et al. 2021, appendix A1.1)
# --------------------------------------------------------------------------

_G_MIN_WORDS, _G_MAX_WORDS = 50, 100_000
_G_MIN_WLEN, _G_MAX_WLEN = 3.0, 10.0
_G_SYMBOL_RATIO = 0.1  # '#' or '…'/'...' per word
_G_MIN_ALPHA_FRAC = 0.80  # words containing ≥1 alphabetic char
_G_MIN_STOP_HITS = 2  # distinct hits from the small required set
_G_TOP_BIGRAM_FRAC = 0.20  # chars covered by the dominant bigram
_G_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-wins document screen after the published Gopher rule set
    (Rae et al. 2021, A1.1): word-count bounds, mean-word-length band,
    symbol-to-word ratio, alphabetic-word fraction, required-stopword
    hits, and the repetition rule — a document whose dominant word bigram
    covers over 20 % of its characters is boilerplate/chant-like. Output:
    per-verdict counts + mean word count (the corpus funnel view).

    Words are whitespace tokens of the lowercased text (the same
    convention as text_token_stats) so punctuation-only tokens exist for
    the alphabetic rule to catch. The repetition signal is the max over
    bigrams of ``occurrences × bigram_chars / n_chars`` — "most characters
    covered", which needs no frequency tie-break and equals Gopher's
    most-frequent-2-gram fraction whenever one bigram dominates;
    overlapping occurrences double-count shared words identically in both
    engines.

    Scale shape: every per-row rule is codegen over the scan. The bigram
    stage is the one shuffle — slim (doc_id, bigram) pairs partial-agg'd
    to per-doc tops, then joined back by doc_id; the text column itself
    never moves. At 10^12 docs the bigram pairs dominate the exchange, so
    the production form pre-hashes bigrams to int64 before the shuffle
    (same plan, narrower rows); kept as strings here so the oracle can
    replay lengths directly.
    """
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = docs.select("doc_id", "n_chars", words.alias("words"))
    n_words = F.size("words")
    mean_wlen = (
        F.aggregate("words", F.lit(0), lambda acc, w: acc + F.length(w))
        / n_words
    )
    symbols = F.aggregate(
        "words",
        F.lit(0),
        lambda acc, w: acc
        + F.length(F.regexp_replace(w, r"[^#…]", ""))
        + F.regexp_count(w, F.lit(r"\.\.\.")),
    )
    alpha_frac = (
        F.size(F.filter("words", lambda w: w.rlike("[a-z]"))) / n_words
    )
    stop_hits = F.size(
        F.array_distinct(F.filter("words", lambda w: w.isin(*_G_STOPS)))
    )
    per_doc = base.select(
        "doc_id",
        "n_chars",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_wlen"),
        (symbols / n_words).alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
    )
    bigrams = base.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.when(
                F.size("words") >= 2,
                F.expr(
                    "transform(sequence(0, size(words)-2),"
                    " i -> concat(words[i], ' ', words[i+1]))"
                ),
            ).otherwise(F.array())
        ).alias("bigram"),
    )
    top_frac = (
        bigrams.groupBy("doc_id", "n_chars", "bigram")
        .count()
        .groupBy("doc_id")
        .agg(
            F.max(
                F.col("count") * F.length("bigram") / F.col("n_chars")
            ).alias("top_bigram_frac")
        )
    )
    scored = per_doc.join(top_frac, "doc_id", "left").withColumn(
        "top_bigram_frac", F.coalesce("top_bigram_frac", F.lit(0.0))
    )
    verdict = (
        F.when(F.col("n_words") < _G_MIN_WORDS, "too_few_words")
        .when(F.col("n_words") > _G_MAX_WORDS, "too_many_words")
        .when(
            (F.col("mean_wlen") < _G_MIN_WLEN)
            | (F.col("mean_wlen") > _G_MAX_WLEN),
            "word_length_out",
        )
        .when(F.col("symbol_ratio") > _G_SYMBOL_RATIO, "symbol_heavy")
        .when(F.col("alpha_frac") < _G_MIN_ALPHA_FRAC, "low_alpha_words")
        .when(F.col("stop_hits") < _G_MIN_STOP_HITS, "missing_stopwords")
        .when(F.col("top_bigram_frac") > _G_TOP_BIGRAM_FRAC, "repetitive")
        .otherwise("ok")
    )
    return (
        scored.withColumn("verdict", verdict)
        .groupBy("verdict")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_words") + 1e-9, 2).alias("avg_words"),
            F.round(F.avg("top_bigram_frac") + 1e-9, 4).alias(
                "avg_top_bigram_frac"
            ),
        )
        .orderBy("verdict")
    )


_GOPHER_SQL = f"""
WITH base AS (
  SELECT doc_id, n_chars,
         string_split_regex(trim(lower(text)), '\\s+') AS words
  FROM documents
), per_doc AS (
  SELECT doc_id, n_chars, len(words) AS n_words,
         list_sum(list_transform(words, w -> length(w)))::DOUBLE
           / len(words) AS mean_wlen,
         list_sum(list_transform(words,
             w -> length(regexp_replace(w, '[^#…]', '', 'g'))
                  + len(regexp_extract_all(w, '\\.\\.\\.'))))::DOUBLE
           / len(words) AS symbol_ratio,
         len(list_filter(words, w -> regexp_matches(w, '[a-z]')))::DOUBLE
           / len(words) AS alpha_frac,
         len(list_distinct(list_filter(words,
             w -> w IN {_G_STOPS!r}))) AS stop_hits
  FROM base
), bg AS (
  SELECT doc_id, n_chars,
         unnest(list_transform(range(1, len(words)),
                               i -> words[i] || ' ' || words[i + 1]))
           AS bigram
  FROM base
), top AS (
  SELECT doc_id,
         max(cnt * length(bigram) / n_chars::DOUBLE) AS top_bigram_frac
  FROM (
    SELECT doc_id, n_chars, bigram, count(*)::BIGINT AS cnt
    FROM bg GROUP BY doc_id, n_chars, bigram
  ) GROUP BY doc_id
), scored AS (
  SELECT p.*, coalesce(t.top_bigram_frac, 0.0) AS top_bigram_frac
  FROM per_doc p LEFT JOIN top t USING (doc_id)
), v AS (
  SELECT n_words, top_bigram_frac,
         CASE WHEN n_words < {_G_MIN_WORDS} THEN 'too_few_words'
              WHEN n_words > {_G_MAX_WORDS} THEN 'too_many_words'
              WHEN mean_wlen < {_G_MIN_WLEN} OR mean_wlen > {_G_MAX_WLEN}
                THEN 'word_length_out'
              WHEN symbol_ratio > {_G_SYMBOL_RATIO} THEN 'symbol_heavy'
              WHEN alpha_frac < {_G_MIN_ALPHA_FRAC} THEN 'low_alpha_words'
              WHEN stop_hits < {_G_MIN_STOP_HITS} THEN 'missing_stopwords'
              WHEN top_bigram_frac > {_G_TOP_BIGRAM_FRAC} THEN 'repetitive'
              ELSE 'ok' END AS verdict
  FROM scored
)
SELECT verdict, count(*)::BIGINT AS n_docs,
       round(avg(n_words) + 1e-9, 2) AS avg_words,
       round(avg(top_bigram_frac) + 1e-9, 4) AS avg_top_bigram_frac
FROM v GROUP BY verdict ORDER BY verdict
"""


# --------------------------------------------------------------------------
# full Gopher repetition-metrics suite (A1.2)
# --------------------------------------------------------------------------

# published thresholds (Rae et al. 2021, table A1): a document is filtered
# when the most-frequent n-gram covers too many characters (n = 2..4) or when
# DUPLICATED n-grams' excess occurrences cover too many characters (n = 5..8)
_REP_TOP = {2: 0.20, 3: 0.18, 4: 0.16}
_REP_DUP = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12}


def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Gopher repetition suite (Rae et al. 2021, A1.2), extending
    ``text_gopher_rules``'s single dominant-bigram signal to all seven
    published n-gram metrics: for n = 2..4 the character fraction covered by
    the MOST FREQUENT n-gram (``count × gram_chars / n_chars``), for
    n = 5..8 the character fraction covered by EXCESS occurrences of every
    duplicated n-gram (``Σ_{count>1} (count-1) × gram_chars / n_chars``).
    First-match-wins verdict in ascending-n order; docs failing nothing are
    ``ok``. Line-based metrics (duplicate-line fraction) are omitted — the
    synthetic corpus is single-line, so they would be identically zero.

    Overlapping occurrences double-count shared characters, identically in
    both engines (fractions may exceed 1 on chant-like docs — a feature:
    the signal saturates exactly where the rule fires hardest).

    Scale shape: ONE explode produces all (n, gram) windows for the seven
    n's in a single pass (no per-n rescan), the count + per-(doc, n) fold
    are two map-side-combined partial aggs on slim rows, and the per-doc
    pivot is a 7-cell conditional agg. The text column never leaves the
    scan. At 10^12 docs the production form pre-hashes grams to int64
    before the shuffle and carries gram length alongside (same plan,
    narrower exchange); grams stay strings here so the oracle can replay
    lengths directly.
    """
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = docs.select("doc_id", "n_chars", words.alias("words"))
    per_n_windows = [
        F.when(
            F.size("words") >= n,
            F.expr(
                f"transform(sequence(0, size(words)-{n}), i ->"
                f" named_struct('n', {n}, 'gram',"
                f" concat_ws(' ', slice(words, i+1, {n}))))"
            ),
        ).otherwise(F.expr("array()"))
        for n in sorted(_REP_TOP | _REP_DUP)
    ]
    grams = base.select(
        "doc_id",
        "n_chars",
        F.explode(F.flatten(F.array(*per_n_windows))).alias("g"),
    ).select("doc_id", "n_chars", "g.n", "g.gram")
    per_n = (
        grams.groupBy("doc_id", "n_chars", "n", "gram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id", "n_chars", "n")
        .agg(
            F.max(
                F.col("cnt") * F.length("gram") / F.col("n_chars")
            ).alias("top_frac"),
            (
                F.sum(
                    F.when(
                        F.col("cnt") > 1,
                        (F.col("cnt") - 1) * F.length("gram"),
                    ).otherwise(F.lit(0))
                )
                / F.col("n_chars")
            ).alias("dup_frac"),
        )
    )
    pivoted = per_n.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("top_frac"))), F.lit(0.0)
            ).alias(f"top{n}")
            for n in _REP_TOP
        ],
        *[
            F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("dup_frac"))), F.lit(0.0)
            ).alias(f"dup{n}")
            for n in _REP_DUP
        ],
    )
    # short docs produce no windows at all — keep them (all-zero metrics)
    scored = docs.select("doc_id").join(pivoted, "doc_id", "left")
    for n in _REP_TOP:
        scored = scored.withColumn(
            f"top{n}", F.coalesce(F.col(f"top{n}"), F.lit(0.0))
        )
    for n in _REP_DUP:
        scored = scored.withColumn(
            f"dup{n}", F.coalesce(F.col(f"dup{n}"), F.lit(0.0))
        )
    arms = [
        (f"top{n}_gram", F.col(f"top{n}") > t) for n, t in _REP_TOP.items()
    ] + [(f"dup{n}_gram", F.col(f"dup{n}") > t) for n, t in _REP_DUP.items()]
    expr = F.when(arms[0][1], arms[0][0])
    for name, cond in arms[1:]:
        expr = expr.when(cond, name)
    expr = expr.otherwise("ok")
    return (
        scored.withColumn("verdict", expr)
        .groupBy("verdict")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("top2") + 1e-9, 4).alias("avg_top2"),
            F.round(F.avg("dup5") + 1e-9, 4).alias("avg_dup5"),
        )
        .orderBy("verdict")
    )


def _repetition_sql() -> str:
    ns = sorted(_REP_TOP | _REP_DUP)
    gram_selects = "\n  UNION ALL\n".join(
        f"""  SELECT doc_id, n_chars, {n} AS n,
         unnest(list_transform(range(1, len(words) - {n} + 2),
                i -> array_to_string(words[i:i+{n - 1}], ' '))) AS gram
  FROM base WHERE len(words) >= {n}"""
        for n in ns
    )
    tops = ",\n         ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN top_frac END), 0.0) AS top{n}"
        for n in _REP_TOP
    )
    dups = ",\n         ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN dup_frac END), 0.0) AS dup{n}"
        for n in _REP_DUP
    )
    arms = "\n              ".join(
        [
            f"WHEN top{n} > {t} THEN 'top{n}_gram'"
            for n, t in _REP_TOP.items()
        ]
        + [
            f"WHEN dup{n} > {t} THEN 'dup{n}_gram'"
            for n, t in _REP_DUP.items()
        ]
    )
    return f"""
WITH base AS (
  SELECT doc_id, n_chars,
         string_split_regex(trim(lower(text)), '\\s+') AS words
  FROM documents
), grams AS (
{gram_selects}
), per_n AS (
  SELECT doc_id, n_chars, n,
         max(cnt * length(gram) / n_chars::DOUBLE) AS top_frac,
         sum(CASE WHEN cnt > 1 THEN (cnt - 1) * length(gram)
                  ELSE 0 END) / n_chars::DOUBLE AS dup_frac
  FROM (
    SELECT doc_id, n_chars, n, gram, count(*)::BIGINT AS cnt
    FROM grams GROUP BY ALL
  ) GROUP BY doc_id, n_chars, n
), pivoted AS (
  SELECT doc_id,
         {tops},
         {dups}
  FROM per_n GROUP BY doc_id
), scored AS (
  SELECT d.doc_id,
         coalesce(top2, 0.0) AS top2, coalesce(top3, 0.0) AS top3,
         coalesce(top4, 0.0) AS top4, coalesce(dup5, 0.0) AS dup5,
         coalesce(dup6, 0.0) AS dup6, coalesce(dup7, 0.0) AS dup7,
         coalesce(dup8, 0.0) AS dup8
  FROM documents d LEFT JOIN pivoted USING (doc_id)
), v AS (
  SELECT top2, dup5,
         CASE {arms}
              ELSE 'ok' END AS verdict
  FROM scored
)
SELECT verdict, count(*)::BIGINT AS n_docs,
       round(avg(top2) + 1e-9, 4) AS avg_top2,
       round(avg(dup5) + 1e-9, 4) AS avg_dup5
FROM v GROUP BY verdict ORDER BY verdict
"""


QUERIES = {
    "split_train_valid_test": split_train_valid_test,
    "text_normalize_stats": text_normalize_stats,
    "quality_rule_ablation": quality_rule_ablation,
    "text_gopher_rules": text_gopher_rules,
    "text_repetition_metrics": text_repetition_metrics,
}

ORACLE = {
    "split_train_valid_test": _SPLIT_SQL,
    "text_normalize_stats": _NORMALIZE_SQL,
    "quality_rule_ablation": _ABLATION_SQL,
    "text_gopher_rules": _GOPHER_SQL,
    "text_repetition_metrics": _repetition_sql(),
}
