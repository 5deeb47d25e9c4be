"""Text analysis over the ``documents`` table: token counting, quality
scoring, marker-word language ID, document fingerprinting.

Training-data-pipeline ops (the analogs feed the clips pipeline's transcript
rules; reference analog: the scalar-function layer of SURVEY.md §2.6). All
pure Catalyst column expressions — no UDFs — with DuckDB oracles. Float
determinism: scores are built from identical expression trees in both engines
(small-int divisions and fixed constants), so doubles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._tables import load

# BPE-ish tokenizer: letter runs, digit runs, single punctuation marks
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# Marker-word sets for the n-gram-heuristic language ID (synthetic corpus →
# synthetic markers; the operator shape is what matters: per-set hit counts,
# argmax with deterministic tie-break).
MARKERS = {
    "sqlish": ("table", "query", "join", "scan", "sort", "filter"),
    "streamish": ("stream", "window", "batch", "event", "line"),
    "storish": ("row", "column", "part", "key", "hash", "value"),
}


def _words(col: str = "text") -> F.Column:
    return F.split(F.trim(F.col(col)), r"\s+")


# ---------------------------------------------------------------------------
# token counting — whitespace + regex tokenizer
# ---------------------------------------------------------------------------

def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "n_chars",
        F.size(_words()).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(TOKEN_RE)).alias("re_tokens"),
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws_tokens").alias("sum_ws_tokens"),
        F.sum("re_tokens").alias("sum_re_tokens"),
        F.round(F.avg("n_chars") + 1e-9, 4).alias("avg_chars"),
    )


_TOKEN_STATS_SQL = f"""
SELECT source, count(*)::BIGINT AS n_docs,
       sum(len(string_split_regex(trim(text), '\\s+')))::BIGINT AS sum_ws_tokens,
       sum(len(regexp_extract_all(text, '{TOKEN_RE}')))::BIGINT AS sum_re_tokens,
       round(avg(n_chars) + 1e-9, 4) AS avg_chars
FROM documents GROUP BY source
"""


# ---------------------------------------------------------------------------
# quality scoring — length / stopword / punctuation components
# ---------------------------------------------------------------------------

def _quality_score() -> F.Column:
    """The composite quality score as ONE column expression (length /
    stopword / punctuation components) — shared by ``text_quality_score``,
    ``quality_calibration_per_source`` and the dedup keeper election so
    every consumer scores with the identical formula."""
    words = _words()
    n_words = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    len_score = F.least(F.col("n_chars") / 400.0, F.lit(1.0))
    stop_ratio = stop_hits / n_words
    punct_ratio = F.regexp_count(F.col("text"), F.lit(PUNCT_RE)) / F.col("n_chars")
    return 0.5 * len_score + 0.3 * stop_ratio + 0.2 * (
        1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    score = _quality_score()
    bucket = (
        F.when(score >= 0.55, F.lit("high"))
        .when(score >= 0.4, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    # +1e-9 before rounding: component rationals (k/400, k/n_words) can land
    # EXACTLY on a .xxxx5 boundary, where Spark (decimal HALF_UP on the
    # shortest repr) and DuckDB (binary-scaled round) disagree; the epsilon
    # pushes off the boundary identically in both engines
    return docs.select(
        "doc_id",
        F.round(score + 1e-9, 4).alias("quality"),
        bucket.alias("quality_bucket"),
    )


_QUALITY_SQL = f"""
WITH w AS (
  SELECT doc_id, n_chars, text,
         string_split_regex(trim(text), '\\s+') AS words
  FROM documents
), s AS (
  SELECT doc_id,
         0.5 * least(n_chars / 400.0, 1.0)
         + 0.3 * (len(list_filter(words,
                    x -> x IN {STOPWORDS!r}))::DOUBLE / len(words))
         + 0.2 * (1.0 - least(
              (len(regexp_extract_all(text, '{PUNCT_RE}'))::DOUBLE / n_chars)
              * 10.0, 1.0)) AS score
  FROM w
)
SELECT doc_id, round(score + 1e-9, 4) AS quality,
       CASE WHEN score >= 0.55 THEN 'high'
            WHEN score >= 0.4 THEN 'medium'
            ELSE 'low' END AS quality_bucket
FROM s
"""


# ---------------------------------------------------------------------------
# per-source quality calibration — percentile-rank normalization
# ---------------------------------------------------------------------------

CAL_KEEP_PCT = 0.2  # drop the bottom 20% of each source


def quality_calibration_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source CALIBRATION of the quality score — the filter a mixed
    corpus actually needs: raw quality distributions differ per source
    (a clean-books 0.5 and a web-crawl 0.5 mean different things), so a
    single global threshold over-prunes the weakest source and under-prunes
    the strongest. Replacing the raw score with its within-source percentile
    rank makes "drop the bottom 20%" mean the same thing everywhere — the
    CCNet-style per-shard quantile bucketing, expressed as one window.

    Plan shape at 10^12 docs: the score is map-only codegen over the scan;
    the calibration is ONE window hash-partitioned by ``source`` —
    percent_rank needs a per-source sort, which AQE splits across tasks per
    source partition; with thousands of sources the key is uniform enough,
    and for a pathological mega-source the switch is the same as
    `clips_quality_curriculum`: approxQuantile thresholds instead of an
    exact rank. Ranking uses the ROUNDED quality (4 dp) so both engines
    see identical tie groups — percent_rank is tie-stable (equal inputs get
    equal ranks), making the output order-insensitive.

    Reference analog: the calibration-level rule P4
    (``storage_name.py:89-93``) generalized from a literal cascade to a
    distribution-relative rule.
    """
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.round(_quality_score() + 1e-9, 4).alias("quality"),
    )
    w = Window.partitionBy("source").orderBy(F.col("quality").asc())
    cal = F.round(F.percent_rank().over(w) + 1e-9, 6)
    return scored.withColumn("cal_pct", cal).select(
        "doc_id",
        "source",
        "quality",
        "cal_pct",
        (F.col("cal_pct") >= CAL_KEEP_PCT).alias("keep"),
    )


_CALIBRATION_SQL = f"""
WITH w AS (
  SELECT doc_id, source, n_chars, text,
         string_split_regex(trim(text), '\\s+') AS words
  FROM documents
), s AS (
  SELECT doc_id, source,
         round(0.5 * least(n_chars / 400.0, 1.0)
         + 0.3 * (len(list_filter(words,
                    x -> x IN {STOPWORDS!r}))::DOUBLE / len(words))
         + 0.2 * (1.0 - least(
              (len(regexp_extract_all(text, '{PUNCT_RE}'))::DOUBLE / n_chars)
              * 10.0, 1.0)) + 1e-9, 4) AS quality
  FROM w
)
SELECT doc_id, source, quality,
       round(percent_rank() OVER (PARTITION BY source ORDER BY quality ASC)
             + 1e-9, 6) AS cal_pct,
       round(percent_rank() OVER (PARTITION BY source ORDER BY quality ASC)
             + 1e-9, 6) >= {CAL_KEEP_PCT} AS keep
FROM s
"""


# ---------------------------------------------------------------------------
# marker-set language ID — hit counts, argmax with deterministic tie-break
# ---------------------------------------------------------------------------

def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = _words()
    def _hit_counter(markers: tuple[str, ...]) -> F.Column:
        return F.size(F.filter(words, lambda w: w.isin(*markers)))

    hits = {name: _hit_counter(s) for name, s in MARKERS.items()}
    h_sql, h_str, h_sto = hits["sqlish"], hits["streamish"], hits["storish"]
    predicted = (
        F.when((h_sql >= h_str) & (h_sql >= h_sto), F.lit("sqlish"))
        .when(h_str >= h_sto, F.lit("streamish"))
        .otherwise(F.lit("storish"))
    )
    return (
        docs.withColumn("predicted", predicted)
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


_LANGID_SQL = f"""
WITH w AS (
  SELECT lang, string_split_regex(trim(text), '\\s+') AS words FROM documents
), h AS (
  SELECT lang,
         len(list_filter(words, x -> x IN {MARKERS["sqlish"]!r})) AS h_sql,
         len(list_filter(words, x -> x IN {MARKERS["streamish"]!r})) AS h_str,
         len(list_filter(words, x -> x IN {MARKERS["storish"]!r})) AS h_sto
  FROM w
)
SELECT lang,
       CASE WHEN h_sql >= h_str AND h_sql >= h_sto THEN 'sqlish'
            WHEN h_str >= h_sto THEN 'streamish'
            ELSE 'storish' END AS predicted,
       count(*)::BIGINT AS n_docs
FROM h GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# document fingerprinting — full, prefix, and head-shingle hashes
# ---------------------------------------------------------------------------

def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    head = F.concat_ws(" ", F.slice(F.split(norm, " "), 1, 8))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp"),
        F.md5(F.substring(norm, 1, 64)).alias("prefix_fp"),
        F.md5(head).alias("head_fp"),
    )


_FINGERPRINT_SQL = """
WITH n AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
  FROM documents
)
SELECT doc_id, md5(norm) AS fp,
       md5(substr(norm, 1, 64)) AS prefix_fp,
       md5(array_to_string(string_split(norm, ' ')[1:8], ' ')) AS head_fp
FROM n
"""


# ---------------------------------------------------------------------------
# deterministic stratified sampling — hash-gated, single pass
# ---------------------------------------------------------------------------

_SAMPLE_MOD = 20  # 5% per stratum


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic 1/``_SAMPLE_MOD`` sample via an md5 hash
    gate — the training-data way to subsample 10^12 rows reproducibly:
    ``rand()`` is partition-layout-dependent (a retry resamples differently)
    while the content hash picks the SAME rows on any cluster, any engine.
    Sample membership + stratum totals come out of ONE aggregation pass
    (conditional agg), not a sample-then-join."""
    docs = load(spark, sf_dir, "documents")
    h = F.expr(
        "conv(substring(md5(cast(doc_id AS string)), 1, 15), 16, 10)"
    ).cast("bigint")
    in_sample = (h % _SAMPLE_MOD) == 0
    return docs.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.sum(in_sample.cast("long")).alias("n_sampled"),
        F.round(
            F.avg(F.when(in_sample, F.col("n_chars"))) + 1e-9, 4
        ).alias("sample_avg_chars"),
    )


_SAMPLE_SQL = f"""
SELECT source,
       count(*)::BIGINT AS n_total,
       sum(CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                     % {_SAMPLE_MOD} = 0 THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
       round(avg(CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                           % {_SAMPLE_MOD} = 0 THEN n_chars END) + 1e-9, 4)
           AS sample_avg_chars
FROM documents GROUP BY source
"""


# ---------------------------------------------------------------------------
# token top-k per language — vocabulary head, the BPE-training precursor
# ---------------------------------------------------------------------------

_TOPK_TOKENS = 5


def token_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent whitespace tokens per language: explode → partial-agg
    count (map-side combine collapses the token exchange to distinct tokens
    per partition) → windowed top-k over the small aggregate. The shape a
    tokenizer-training corpus scan uses at 100 TB."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(_words()).alias("token")
    ).filter(F.length("token") > 0)
    counts = tok.groupBy("lang", "token").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(
        F.col("n").desc(), F.col("token").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK_TOKENS)
        .select("lang", "token", "n", "rank")
    )


_TOKEN_TOPK_SQL = f"""
WITH tok AS (
  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents
), c AS (
  SELECT lang, token, count(*)::BIGINT AS n FROM tok
  WHERE len(token) > 0 GROUP BY 1, 2
)
SELECT lang, token, n, rank::INTEGER AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY n DESC, token ASC) AS rank
  FROM c
)
WHERE rank <= {_TOPK_TOKENS}
"""


# ---------------------------------------------------------------------------
# benchmark decontamination — eval-set n-gram overlap scan
# ---------------------------------------------------------------------------

_DECON_N = 5  # words per n-gram (real pipelines use 8-13; 5 fits the corpus)
_DECON_MOD = 29  # doc_id % MOD == 0 plays the role of the held-out eval set


def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data decontamination: flag training documents that share any
    word ``_DECON_N``-gram with a held-out eval set (here: every 29th doc).

    Scale shape: eval n-grams are a small distinct set (eval suites are
    thousands of docs, not billions) → ``broadcast`` hash join against the
    exploded training n-grams, so the only wide op is the per-doc hit count
    (partial agg). At 100 TB the gram strings would be ``xxhash64``-ed before
    the join to shrink the probe side; kept as strings here so the DuckDB
    oracle matches byte-for-byte. Reference analog: the rejected-known-
    failures exclusion (J3, ``config/config.yml:56-60``) — membership in a
    curated side list gates the row."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", _words().alias("toks")
    )
    idx = F.when(
        F.size("toks") >= _DECON_N,
        F.sequence(F.lit(1), F.size("toks") - (_DECON_N - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("toks"), i, _DECON_N)
                    ),
                )
            )
        ).alias("gram"),
    )
    ev = (
        grams.filter(F.col("doc_id") % _DECON_MOD == 0)
        .select("gram")
        .distinct()
    )
    return (
        grams.filter(F.col("doc_id") % _DECON_MOD != 0)
        .join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_hits"))
    )


_DECON_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, greatest(len(toks) - {_DECON_N - 1}, 0) + 1),
           i -> array_to_string(toks[i:i + {_DECON_N - 1}], ' '))) AS gram
  FROM t
),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_DECON_MOD} = 0)
SELECT g.doc_id, count(DISTINCT g.gram)::BIGINT AS n_hits
FROM g JOIN ev USING (gram)
WHERE g.doc_id % {_DECON_MOD} <> 0
GROUP BY g.doc_id
"""


# ---------------------------------------------------------------------------
# token-budget sampling — distributed prefix-sum "take until N tokens"
# ---------------------------------------------------------------------------

_TOKEN_BUDGET = 15_000
_BUDGET_BUCKET = 64  # doc_ids per prefix-sum bucket


def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget sampling: take documents in ``doc_id`` order until
    the cumulative token count reaches ``_TOKEN_BUDGET`` — how a training run
    carves a fixed-token subcorpus from a larger pool.

    A naive ``Window.orderBy(doc_id)`` is a single-partition sort — the
    classic global-cumsum trap at 100 TB. Implemented instead as the
    two-pass distributed prefix sum: (1) within-bucket cumsum, parallel over
    ``floor(doc_id/{bucket})`` buckets; (2) bucket totals (one tiny shuffle
    of n_buckets rows) → prefix offsets, broadcast back. The only global
    ordering work is over the bucket-totals table, which is ~rows/64 and at
    real scale would be ~n_partitions rows."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(_words()).cast("long").alias("tok"),
    )
    from pyspark.sql.window import Window

    d = docs.withColumn(
        "bucket", F.floor(F.col("doc_id") / _BUDGET_BUCKET)
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("cum_in", F.sum("tok").over(w_in))
    totals = d.groupBy("bucket").agg(F.sum("tok").alias("btot"))
    w_b = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "boff", F.coalesce(F.sum("btot").over(w_b), F.lit(0))
    ).select("bucket", "boff")
    return (
        d.join(F.broadcast(offsets), "bucket")
        .withColumn("cum", F.col("cum_in") + F.col("boff"))
        .filter(F.col("cum") <= _TOKEN_BUDGET)
        .select("doc_id", "source", "tok", "cum")
    )


_BUDGET_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\\s+'))::BIGINT AS tok
  FROM documents
),
c AS (
  SELECT doc_id, source, tok,
         sum(tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, source, tok, cum FROM c WHERE cum <= {_TOKEN_BUDGET}
"""


# ---------------------------------------------------------------------------
# mixture-quota sampling — per-source quotas (training-data "data mixing")
# ---------------------------------------------------------------------------


def sample_mixture_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a training mixture: each source contributes a configured quota
    of documents, chosen by a deterministic content-hash ranking (not
    ``rand()`` — a task retry or a different engine must select the SAME
    rows). Here the per-source quota derives from the source id
    (``2 + src_id % 5``); in a real run it is a broadcast weight table.

    Scale shape: ``row_number`` over ``partitionBy(source)`` — one shuffle,
    parallel across sources; skewed sources are still a single partition
    each, so at 10^12 rows the ranking would switch to a per-source
    threshold on the hash value (quantile of md5 space ≈ quota/n_source),
    which needs no global sort at all; the windowed form is exact and is
    what the oracle checks."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    src_id = F.substring("source", 4, 10).cast("int")
    quota = (F.lit(2) + src_id % 5).alias("quota")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", quota)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.col("quota"))
        .select("doc_id", "source", "rk")
    )


_MIXTURE_SQL = """
WITH r AS (
  SELECT doc_id, source,
         2 + (substr(source, 4)::INT % 5) AS quota,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
  FROM documents
)
SELECT doc_id, source, rk::INTEGER AS rk FROM r WHERE rk <= quota
"""


# ---------------------------------------------------------------------------
# intra-document repetition removal (CCNet-style dedup-within-doc)
# ---------------------------------------------------------------------------

SEG_W = 2  # words per segment; in production this is a line/paragraph


def doc_intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove repeated content *within* each document, preserving first-
    occurrence order — the per-doc analog of corpus-level dedup (CCNet /
    RefinedWeb drop repeated lines/paragraphs before corpus MinHash).

    Two granularities, both exercised by the corpus: word-level (heavy
    repeats) and ``SEG_W``-word segments (the line/paragraph stand-in).
    Entirely higher-order array expressions (``array_distinct`` preserves
    first-occurrence order) — a pure whole-stage-codegen projection with
    ZERO shuffle: at 10^12 docs this runs at scan speed, embarrassingly
    parallel, no exchange at any width. Reference analog: the per-item
    in-place repair visitors (wallaby2caom2/main_app.py:242-263) — a pure
    row transform, no regroup.
    """
    docs = load(spark, sf_dir, "documents")
    words = _words()
    n_seg = F.ceil(F.size(words) / F.lit(SEG_W)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * SEG_W + 1, SEG_W)),
    )
    d = docs.select(
        "doc_id",
        words.alias("w"),
        segs.alias("s"),
    ).select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_uniq_words"),
        F.size("s").alias("n_segs"),
        F.size(F.array_distinct("s")).alias("n_uniq_segs"),
        F.concat_ws(" ", F.array_distinct("w")).alias("dedup_words_text"),
        F.concat_ws(" ", F.array_distinct("s")).alias("dedup_segs_text"),
    )
    return d.select(
        "doc_id",
        "n_words",
        "n_uniq_words",
        F.round(F.lit(1.0) - F.col("n_uniq_words") / F.col("n_words") + 1e-9, 4)
        .alias("word_rep_ratio"),
        "n_segs",
        "n_uniq_segs",
        "dedup_words_text",
        "dedup_segs_text",
    )


_INTRADOC_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
  FROM documents
),
pos AS (
  SELECT doc_id, words,
         unnest(generate_series(1, len(words))) AS p
  FROM d
),
w AS (SELECT doc_id, p, words[p] AS word FROM pos),
wfirst AS (
  SELECT doc_id, p, word,
         row_number() OVER (PARTITION BY doc_id, word ORDER BY p) AS rn
  FROM w
),
wded AS (
  SELECT doc_id,
         string_agg(word, ' ' ORDER BY p) FILTER (WHERE rn = 1) AS dedup_words_text,
         count(*) AS n_words,
         count(*) FILTER (WHERE rn = 1) AS n_uniq_words
  FROM wfirst GROUP BY doc_id
),
segidx AS (
  SELECT doc_id, words,
         unnest(generate_series(0,
             CAST(ceil(len(words) / {SEG_W}.0) AS INT) - 1)) AS s
  FROM d
),
seg AS (
  SELECT doc_id, s,
         array_to_string(list_slice(words, s*{SEG_W}+1, s*{SEG_W}+{SEG_W}), ' ')
           AS segment
  FROM segidx
),
sfirst AS (
  SELECT doc_id, s, segment,
         row_number() OVER (PARTITION BY doc_id, segment ORDER BY s) AS rn
  FROM seg
),
sded AS (
  SELECT doc_id,
         string_agg(segment, ' ' ORDER BY s) FILTER (WHERE rn = 1) AS dedup_segs_text,
         count(*) AS n_segs,
         count(*) FILTER (WHERE rn = 1) AS n_uniq_segs
  FROM sfirst GROUP BY doc_id
)
SELECT wded.doc_id,
       n_words::INTEGER AS n_words,
       n_uniq_words::INTEGER AS n_uniq_words,
       round(1.0 - n_uniq_words / n_words + 1e-9, 4) AS word_rep_ratio,
       n_segs::INTEGER AS n_segs,
       n_uniq_segs::INTEGER AS n_uniq_segs,
       dedup_words_text,
       dedup_segs_text
FROM wded JOIN sded USING (doc_id)
"""


def doc_crossdoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level repeated-segment removal — the C4 rule ("discard any
    span that occurs more than once in the corpus") at ``SEG_W``-word
    granularity: a segment whose total occurrence count across ALL
    documents exceeds 1 is boilerplate and is cut from every document;
    survivors are reassembled in original order.

    Scale shape (the part that matters at 10^12 docs): segment counting is
    a map-side-combined ``groupBy(segment)`` — one shuffle of (segment,
    partial count) pairs; membership is then an equi-join of the exploded
    segments against the count table (sort-merge at scale, AQE-broadcast
    when the boilerplate set is small), never an all-pairs comparison; the
    reassembly shuffles one slim (doc_id, pos, seg) row per surviving
    segment. Reference analog: the rejected-known-failures exclusion J3
    (``config/config.yml:56-60``) — corpus-derived exclusion list applied
    as a join, here derived from the data itself.
    """
    docs = load(spark, sf_dir, "documents")
    words = _words()
    n_seg = F.ceil(F.size(words) / F.lit(SEG_W)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * SEG_W + 1, SEG_W)),
    )
    exploded = docs.select(
        "doc_id", F.posexplode(segs).alias("pos", "seg")
    )
    seg_counts = exploded.groupBy("seg").agg(F.count("*").alias("n_occ"))
    kept = exploded.join(
        seg_counts.filter(F.col("n_occ") == 1).select("seg"), "seg", "inner"
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    return (
        docs.select("doc_id", n_seg.alias("n_segs"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_segs",
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


_CROSSDOC_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
  FROM documents
),
segidx AS (
  SELECT doc_id, words,
         unnest(generate_series(0,
             CAST(ceil(len(words) / {SEG_W}.0) AS INT) - 1)) AS s
  FROM d
),
seg AS (
  SELECT doc_id, s AS pos,
         array_to_string(list_slice(words, s*{SEG_W}+1, s*{SEG_W}+{SEG_W}), ' ')
           AS seg
  FROM segidx
),
counts AS (SELECT seg, count(*) AS n_occ FROM seg GROUP BY seg),
kept AS (
  SELECT seg.doc_id, seg.pos, seg.seg
  FROM seg JOIN counts USING (seg) WHERE counts.n_occ = 1
),
rebuilt AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(seg, ' ' ORDER BY pos) AS cleaned_text
  FROM kept GROUP BY doc_id
),
nseg AS (
  SELECT doc_id, CAST(ceil(len(words) / {SEG_W}.0) AS INT) AS n_segs FROM d
)
SELECT nseg.doc_id, nseg.n_segs,
       COALESCE(rebuilt.n_kept, 0)::INTEGER AS n_kept,
       COALESCE(rebuilt.cleaned_text, '') AS cleaned_text
FROM nseg LEFT JOIN rebuilt USING (doc_id)
"""


# ---------------------------------------------------------------------------
# hashed linear text classifier — fastText-style scoring fully JVM-side
# ---------------------------------------------------------------------------

CLF_BUCKETS = 64


def _clf_weights() -> list[float]:
    """Deterministic pseudo-random weight vector (md5-derived, like the LSH
    hyperplanes) — inlined as literals into BOTH engines, so the only
    model artifact is the plan itself."""
    import hashlib

    return [
        round(
            int(hashlib.md5(f"clfw_{b}".encode()).hexdigest()[:8], 16) / 2**31
            - 1.0,
            6,
        )
        for b in range(CLF_BUCKETS)
    ]


_CLF_W = _clf_weights()


def text_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FastText-shaped linear scorer WITHOUT leaving the JVM: hashed
    bag-of-words (md5 → 32-bit bucket, the "hashing trick") → mean of
    per-bucket weights → sign as the label. This is the scale path for
    model-based quality scoring when the model is linear: at 10^12 docs the
    whole scorer is a per-row projection — no Python workers, no shuffle,
    no broadcast bigger than the weight literal — where the pipeline's
    pandas-UDF scorers (functions/langid.py) are the path for models that
    need real inference. Cross-engine: md5 is bit-identical in both
    engines; weights are 6-dp literals; the score rounds at 4 dp."""
    words = _words()
    wl = F.array(*[F.lit(w) for w in _CLF_W])
    contrib = F.transform(
        words,
        lambda w: F.element_at(
            wl,
            (
                F.conv(F.substring(F.md5(F.lower(w)), 1, 8), 16, 10).cast(
                    "bigint"
                )
                % CLF_BUCKETS
                + 1
            ).cast("int"),
        ),
    )
    score = F.aggregate(contrib, F.lit(0.0), lambda a, x: a + x) / F.size(words)
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.round(score + 1e-9, 4).alias("score"),
        (score > 0).alias("pred_keep"),
    )


_CLF_SQL = f"""
WITH w AS (SELECT {_CLF_W}::DOUBLE[] AS wl),
d AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS words
  FROM documents
),
scored AS (
  SELECT doc_id, lang,
         list_sum(list_transform(words, t ->
           wl[(('0x' || left(md5(lower(t)), 8))::BIGINT % {CLF_BUCKETS} + 1)::INT]
         )) / len(words) AS raw
  FROM d, w
)
SELECT doc_id, lang, round(raw + 1e-9, 4) AS score, raw > 0 AS pred_keep
FROM scored
"""


# ---------------------------------------------------------------------------
# quality-classifier TRAINING — full-batch gradient descent, Spark-iterative
# ---------------------------------------------------------------------------

TRAIN_BUCKETS = 32
TRAIN_ITERS = 8
TRAIN_LR = 4.0
TRAIN_SCALE = 16.0  # feature scale: raw fractions are ~1/31 while the bias
                    # input is 1.0 — unscaled, the gradient is dominated by
                    # the intercept and 8 steps barely move the word weights


def classifier_train_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the hashed linear quality classifier, not just score with one
    (`text_linear_classifier` is the inference path): full-batch gradient
    descent on a logistic-style model over hashing-trick bag-of-words
    features, expressed in the repo's iterative-algorithm pattern
    (`kmeans_train`, `bpe_train_merges`) — per step the weight vector is a
    broadcast literal, the per-doc margin/error is whole-stage codegen, and
    the gradient is ONE map-side-combined aggregation of TRAIN_BUCKETS
    cells; only the B-cell gradient row returns to the driver between
    steps. At 10^12 docs each step is a single slim scan-and-agg (the
    featurized table is doc_id + B doubles — at real scale you persist it
    once and every step reuses the cache).

    Cross-engine determinism: the link is the SOFTSIGN logistic
    p = 0.5 + 0.5·m/(1+|m|) — rational arithmetic only, so Spark and DuckDB
    produce bit-identical per-doc probabilities (libm ``exp`` is NOT
    guaranteed to round identically across engines, so the textbook sigmoid
    would be a 1-ulp trap of exactly the kind `_sq_l2_to` documents);
    per-step gradients are plan-rounded at 6 dp before becoming next-step
    literals (the `kmeans_train` handoff discipline); labels (lang == 'en')
    and features (bucket-count / n_words) are exact rationals.

    Output: per-lang evaluation of the final model (n_docs, predicted-keep
    count, 4-dp mean margin) — the learned separation of 'en' from the rest.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("lang") == "en").cast("double").alias("y"),
        _words().alias("w"),
    )
    bucket = lambda t: (  # noqa: E731 — md5-prefix hashing trick, _CLF rule
        F.conv(F.substring(F.md5(F.lower(t)), 1, 8), 16, 10).cast("bigint")
        % TRAIN_BUCKETS
    ).cast("int")
    # features: scaled bucket fractions + a trailing bias input of 1.0
    feat = docs.select(
        "doc_id",
        "lang",
        "y",
        F.concat(
            F.transform(
                F.sequence(F.lit(0), F.lit(TRAIN_BUCKETS - 1)),
                lambda b: F.size(
                    F.filter(
                        F.transform(F.col("w"), bucket), lambda x: x == b
                    )
                )
                * TRAIN_SCALE
                / F.size(F.col("w")),
            ),
            F.array(F.lit(1.0)),
        ).alias("f"),
    )

    def margin(weights: list[float]) -> F.Column:
        wl = F.array(*[F.lit(float(v)) for v in weights])
        return F.aggregate(
            F.zip_with(wl, F.col("f"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    n_dims = TRAIN_BUCKETS + 1  # + bias
    weights = [0.0] * n_dims
    for _ in range(TRAIN_ITERS):
        m = margin(weights)
        err = F.lit(0.5) + F.lit(0.5) * m / (F.lit(1.0) + F.abs(m)) - F.col("y")
        row = feat.agg(
            *[
                F.round(F.avg(err * F.col("f").getItem(b)) + 1e-9, 6).alias(
                    f"g{b}"
                )
                for b in range(n_dims)
            ]
        ).collect()[0]
        # plain IEEE double update, NO Python-side rounding (Python rounds
        # half-to-even, DuckDB half-away — the 6-dp plan rounding above is
        # the only rounding, identical in both engines)
        weights = [
            weights[b] - TRAIN_LR * row[f"g{b}"] for b in range(n_dims)
        ]

    m_final = margin(weights)
    return feat.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum((m_final > 0).cast("bigint")).alias("n_pred_keep"),
        F.round(F.avg(m_final) + 1e-9, 4).alias("avg_margin"),
    )


def _train_logreg_sql() -> str:
    """Oracle: the same TRAIN_ITERS gradient steps as a DuckDB CTE chain —
    margins via list_dot_product against the previous step's weight list,
    per-dim gradient via UNNEST(generate_series), weight update as
    element-wise list_transform (everything ::DOUBLE[], never DECIMAL)."""
    n_dims = TRAIN_BUCKETS + 1
    zeros = ", ".join(["0.0"] * n_dims)
    parts = [
        f"""WITH d AS (
  SELECT doc_id, lang, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         list_transform(string_split_regex(trim(text), '\\s+'),
           t -> (('0x' || left(md5(lower(t)), 8))::BIGINT
                 % {TRAIN_BUCKETS})::INT) AS bw
  FROM documents
),
feat AS (
  SELECT doc_id, lang, y,
         list_append(
           [len(list_filter(bw, x -> x = b)) * {TRAIN_SCALE} / len(bw)
            FOR b IN generate_series(0, {TRAIN_BUCKETS - 1})],
           1.0)::DOUBLE[] AS f
  FROM d
),
w0 AS (SELECT [{zeros}]::DOUBLE[] AS wl),""",
    ]
    for it in range(TRAIN_ITERS):
        parts.append(f"""m{it} AS (
  SELECT lang, y, f, list_dot_product(wl, f) AS m FROM feat, w{it}
),""")
        parts.append(f"""g{it} AS (
  SELECT list(gv ORDER BY dim) AS gl FROM (
    SELECT dim,
           round(avg((0.5 + 0.5*m/(1+abs(m)) - y) * f[dim]) + 1e-9, 6) AS gv
    FROM m{it}, UNNEST(generate_series(1, {n_dims})) AS t(dim)
    GROUP BY dim
  )
),""")
        parts.append(f"""w{it + 1} AS (
  SELECT list_transform(generate_series(1, {n_dims}),
                        i -> wl[i] - {TRAIN_LR}*gl[i])::DOUBLE[] AS wl
  FROM w{it}, g{it}
),""")
    parts.append(f"""mf AS (
  SELECT lang, list_dot_product(wl, f) AS m FROM feat, w{TRAIN_ITERS}
)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN m > 0 THEN 1 ELSE 0 END)::BIGINT AS n_pred_keep,
       round(avg(m) + 1e-9, 4) AS avg_margin
FROM mf GROUP BY lang""")
    return "\n".join(parts)


# ---------------------------------------------------------------------------
# distribution drift — population stability index per source
# ---------------------------------------------------------------------------

_PSI_BINS = 10  # decile bins over the corpus baseline
_PSI_EPS = 1e-4  # share smoothing so empty bins stay finite (standard)
# conventional PSI reading: < 0.1 stable, 0.1–0.25 moderate, > 0.25 shifted
_PSI_MODERATE, _PSI_SHIFTED = 0.1, 0.25
# small-sample gate: with B bins, a source needs ~B·5 docs before PSI is
# readable at all — under the densified grid, CHANCE vacancies (25 docs
# can't fill 10 bins) each contribute ≈ q·ln(q/ε) and read as drift. The
# standard practitioner rule is a minimum sample per bin; below it the
# verdict is 'insufficient_data', never a false 'shifted'.
_PSI_MIN_PER_BIN = 5
_PSI_MIN_DOCS = _PSI_BINS * _PSI_MIN_PER_BIN


def quality_psi_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of each source's quality distribution
    against the whole-corpus baseline — the standard drift monitor a
    production curation pipeline runs per ingest batch: a source whose PSI
    drifts past 0.25 changed character (new scraper, new spam wave,
    upstream format shift) and needs its thresholds re-calibrated before
    its documents enter the mix. PSI = Σ (p_b − q_b)·ln(p_b/q_b) over the
    baseline's decile bins, shares smoothed by 1e-4 so empty bins stay
    finite.

    Scale shape: ONE aggregation computes the corpus decile boundaries
    (an array-typed exact percentile here; approx_percentile with the
    tolerance-boolean oracle pattern at 10^12 rows), broadcast as a 1-row
    frame; binning is then a codegen array-count per row (no join key —
    a literal-style cross of one row), and the PSI reduces per source
    from a (source × 10)-cell aggregate. The text column never moves.

    Binning uses the ROUNDED quality (4 dp, the family convention) so both
    engines form identical bins; bin = #boundaries strictly below q puts
    each boundary value itself in the lower bin, matching the SQL replay
    exactly.
    """
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "source", F.round(_quality_score() + 1e-9, 4).alias("q")
    )
    qs = ", ".join(
        str(i / _PSI_BINS) + "D" for i in range(1, _PSI_BINS)
    )
    bounds = scored.agg(
        F.expr(f"percentile(q, array({qs}))").alias("bounds")
    )
    binned = scored.join(F.broadcast(bounds)).select(
        "source",
        F.size(F.filter("bounds", lambda b: b < F.col("q"))).alias("bin"),
    )
    occupied = binned.groupBy("source", "bin").agg(F.count("*").alias("n"))
    # DENSIFY to the full source × bin grid before the PSI sum: a VACATED
    # bin (n=0 where the baseline has mass) is the loudest drift signature
    # — its smoothed term is (ε − q)·ln(ε/q) ≈ +0.69 per vacated decile —
    # and a groupBy over occupied cells only would silently drop exactly
    # those terms (review finding; pinned by the vacated-bin test). The
    # grid is |sources| × 10 rows — broadcast-sized at any corpus scale.
    grid = (
        occupied.select("source")
        .distinct()
        .crossJoin(
            spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
        )
    )
    cells = grid.join(occupied, ["source", "bin"], "left").withColumn(
        "n", F.coalesce("n", F.lit(0))
    )
    w_src = Window.partitionBy("source")
    w_bin = Window.partitionBy("bin")
    w_all = Window.partitionBy()
    p = (F.col("n") / F.sum("n").over(w_src)) + _PSI_EPS
    q_share = (F.sum("n").over(w_bin) / F.sum("n").over(w_all)) + _PSI_EPS
    term = (p - q_share) * F.log(p / q_share)
    psi = (
        cells.select("source", term.alias("term"), F.col("n"))
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_docs"),
            F.round(F.sum("term") + 1e-9, 4).alias("psi"),
        )
    )
    verdict = (
        F.when(F.col("n_docs") < _PSI_MIN_DOCS, "insufficient_data")
        .when(F.col("psi") > _PSI_SHIFTED, "shifted")
        .when(F.col("psi") > _PSI_MODERATE, "moderate")
        .otherwise("stable")
    )
    return psi.select(
        "source", "n_docs", "psi", verdict.alias("drift")
    ).orderBy("source")


_PSI_QS = ", ".join(str(i / _PSI_BINS) for i in range(1, _PSI_BINS))

_PSI_SQL = f"""
WITH w AS (
  SELECT source, n_chars, text,
         string_split_regex(trim(text), '\\s+') AS words
  FROM documents
), scored AS (
  SELECT source,
         round(0.5 * least(n_chars / 400.0, 1.0)
         + 0.3 * (len(list_filter(words,
                    x -> x IN {STOPWORDS!r}))::DOUBLE / len(words))
         + 0.2 * (1.0 - least(
              (len(regexp_extract_all(text, '{PUNCT_RE}'))::DOUBLE / n_chars)
              * 10.0, 1.0)) + 1e-9, 4) AS q
  FROM w
), b AS (
  SELECT quantile_cont(q, [{_PSI_QS}]) AS bounds FROM scored
), binned AS (
  SELECT source,
         len(list_filter(b.bounds, x -> x < s.q)) AS bin
  FROM scored s CROSS JOIN b
), occupied AS (
  SELECT source, bin, count(*)::BIGINT AS n FROM binned GROUP BY 1, 2
), grid AS (
  -- densify to the full source x bin grid: vacated bins must contribute
  SELECT s0.source, r.bin
  FROM (SELECT DISTINCT source FROM occupied) s0
  CROSS JOIN (SELECT range::INT AS bin FROM range({_PSI_BINS})) r
), cells AS (
  SELECT g.source, g.bin, coalesce(o.n, 0) AS n
  FROM grid g LEFT JOIN occupied o ON o.source = g.source AND o.bin = g.bin
), shares AS (
  SELECT source, n,
         n / sum(n) OVER (PARTITION BY source) + {_PSI_EPS} AS p,
         sum(n) OVER (PARTITION BY bin) / sum(n) OVER () + {_PSI_EPS} AS qs
  FROM cells
), psi AS (
  SELECT source, sum(n)::BIGINT AS n_docs,
         round(sum((p - qs) * ln(p / qs)) + 1e-9, 4) AS psi
  FROM shares GROUP BY source
)
SELECT source, n_docs, psi,
       CASE WHEN n_docs < {_PSI_MIN_DOCS} THEN 'insufficient_data'
            WHEN psi > {_PSI_SHIFTED} THEN 'shifted'
            WHEN psi > {_PSI_MODERATE} THEN 'moderate'
            ELSE 'stable' END AS drift
FROM psi ORDER BY source
"""


# ---------------------------------------------------------------------------
# robust outlier screen — MAD over the quality score, per source
# ---------------------------------------------------------------------------

_MAD_K = 1.4826  # scales MAD to σ under normality (the standard constant)
_MAD_CUT = 3.5  # the conventional robust-z cutoff


def quality_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier screen over the per-document
    quality score, per source — the robust counterpart of a z-score cut:
    crawled sources have heavy-tailed quality, so mean/stddev are dragged
    by the very outliers being hunted, while median and MAD are not. A
    document is flagged when ``|q − median_s| > 3.5 · 1.4826 · MAD_s``
    (the conventional robust-z rule); a degenerate source (MAD = 0, i.e.
    over half its docs share one score) flags nothing.

    Scale shape: two slim aggregations of (source, q) — the score itself
    is codegen over the scan — each followed by a broadcast join of a
    |sources|-row table back onto the docs; the payload text never moves.
    Exact percentile is used at test scale; at 10^12 rows the same plan
    swaps in ``approx_percentile`` (mergeable KLL partials) with the
    tolerance-boolean oracle pattern of quantile_sketch_check.

    The score is the rounded ``_quality_score`` (4 decimals) so the
    medians interpolate identical values in both engines.
    """
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.round(_quality_score() + 1e-9, 4).alias("q"),
    )
    med = scored.groupBy("source").agg(
        F.expr("percentile(q, 0.5D)").alias("med_q")
    )
    dev = (
        scored.join(F.broadcast(med), "source")
        .withColumn("adev", F.abs(F.col("q") - F.col("med_q")))
    )
    mad = dev.groupBy("source").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "source").withColumn(
        "is_outlier",
        (F.col("mad") > 0)
        & (F.col("adev") > _MAD_CUT * _MAD_K * F.col("mad")),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.first("med_q") + 1e-9, 4).alias("med_quality"),
            F.round(F.first("mad") + 1e-9, 4).alias("mad"),
            F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        )
        .withColumn(
            "outlier_frac",
            F.round(F.col("n_outliers") / F.col("n_docs") + 1e-9, 4),
        )
        .orderBy("source")
    )


_MAD_SQL = f"""
WITH w AS (
  SELECT doc_id, source, n_chars, text,
         string_split_regex(trim(text), '\\s+') AS words
  FROM documents
), scored AS (
  SELECT doc_id, source,
         round(0.5 * least(n_chars / 400.0, 1.0)
         + 0.3 * (len(list_filter(words,
                    x -> x IN {STOPWORDS!r}))::DOUBLE / len(words))
         + 0.2 * (1.0 - least(
              (len(regexp_extract_all(text, '{PUNCT_RE}'))::DOUBLE / n_chars)
              * 10.0, 1.0)) + 1e-9, 4) AS q
  FROM w
), med AS (
  SELECT source, median(q) AS med_q FROM scored GROUP BY source
), dev AS (
  SELECT s.source, s.q, m.med_q, abs(s.q - m.med_q) AS adev
  FROM scored s JOIN med m USING (source)
), mad AS (
  SELECT source, median(adev) AS mad FROM dev GROUP BY source
), flagged AS (
  SELECT d.source, d.med_q, m.mad,
         (m.mad > 0 AND d.adev > {_MAD_CUT} * {_MAD_K} * m.mad) AS is_outlier
  FROM dev d JOIN mad m USING (source)
)
SELECT source, count(*)::BIGINT AS n_docs,
       round(any_value(med_q) + 1e-9, 4) AS med_quality,
       round(any_value(mad) + 1e-9, 4) AS mad,
       sum(CASE WHEN is_outlier THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
       round(sum(CASE WHEN is_outlier THEN 1 ELSE 0 END)::DOUBLE / count(*)
             + 1e-9, 4) AS outlier_frac
FROM flagged GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# DSIR importance resampling — hashed n-gram importance weights
# ---------------------------------------------------------------------------

# Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): estimate bag-of-hashed-ngram unigram models for a
# TARGET domain and the RAW corpus, weight every raw doc by its
# log-likelihood ratio, and resample the top of the weight distribution —
# cheap domain-targeted selection without training a classifier.
_DSIR_BUCKETS = 512
_DSIR_TARGET_SOURCE = "src0"  # stands in for the curated target domain
_DSIR_KEEP = 200  # resample size at the gate's sf (documented, not tuned)


def sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-shape importance resampling: hashed unigram+bigram features
    (md5 → ``_DSIR_BUCKETS`` buckets), add-half-smoothed feature
    distributions for the target domain vs the full corpus, per-doc
    importance weight ``Σ_f c_f·(ln p_target[f] − ln p_raw[f])``, and a
    deterministic top-``_DSIR_KEEP`` resample on the ROUNDED weight with
    doc_id tiebreak (the bm25_retrieval rank-stability rule — raw doubles
    may differ by 1 ulp across engines; ranked doubles are rounded first).
    Output: per-source selection funnel — the planted property is that the
    target-like sources are over-represented among selected docs.

    Scale shape: ONE explode of slim (doc_id, bucket) rows feeds BOTH
    model estimation (a ``_DSIR_BUCKETS``-row map-side-combined agg; the
    two totals ride along via a 1-row cross join broadcast) and the
    per-doc weight (equi-join of per-doc bucket counts against the
    broadcast 512-row ratio table, then one partial-agg sum). The global
    top-K window here ranks slim (weight, doc_id) rows only; at 10^12
    docs the production form replaces it with the two-pass distributed
    quantile threshold proven in ``sample_token_budget``.
    """
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = docs.select("doc_id", "source", words.alias("words"))
    grams = base.select(
        "doc_id",
        "source",
        F.explode(
            F.concat(
                F.col("words"),
                F.when(
                    F.size("words") >= 2,
                    F.expr(
                        "transform(sequence(0, size(words)-2),"
                        " i -> concat(words[i], ' ', words[i+1]))"
                    ),
                ).otherwise(F.expr("array()")),
            )
        ).alias("gram"),
    )
    feats = grams.select(
        "doc_id",
        "source",
        (
            F.expr("conv(substring(md5(gram), 1, 8), 16, 10)").cast("bigint")
            % _DSIR_BUCKETS
        ).alias("bucket"),
    )
    is_target = F.col("source") == _DSIR_TARGET_SOURCE
    model = feats.groupBy("bucket").agg(
        F.sum(is_target.cast("long")).alias("t_f"),
        F.count("*").alias("r_f"),
    )
    totals = model.agg(
        F.sum("t_f").alias("t_tot"), F.sum("r_f").alias("r_tot")
    )
    ratio = model.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("t_f") + 0.5) / (F.col("t_tot") + _DSIR_BUCKETS / 2))
            - F.log((F.col("r_f") + 0.5) / (F.col("r_tot") + _DSIR_BUCKETS / 2))
        ).alias("log_ratio"),
    )
    doc_w = (
        feats.groupBy("doc_id", "source", "bucket")
        .agg(F.count("*").alias("c"))
        .join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id", "source")
        .agg(F.round(F.sum(F.col("c") * F.col("log_ratio")) + 1e-9, 4).alias("w"))
    )
    # unpartitioned window BY DESIGN over the per-doc weight aggregate —
    # bounded-window contract pinned by tests/test_plan_shapes.py::
    # test_global_windows_sit_above_bounded_inputs
    rk = F.row_number().over(
        Window.orderBy(F.col("w").desc(), F.col("doc_id"))
    )
    selected = doc_w.withColumn("rk", rk).withColumn(
        "selected", F.col("rk") <= _DSIR_KEEP
    )
    return (
        selected.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("selected").cast("long")).alias("n_selected"),
            F.round(F.avg("w") + 1e-9, 4).alias("avg_weight"),
            F.round(F.avg(F.when(F.col("selected"), F.col("w"))) + 1e-9, 4)
            .alias("avg_selected_weight"),
        )
        .orderBy("source")
    )


_DSIR_SQL = f"""
WITH base AS (
  SELECT doc_id, source,
         string_split_regex(trim(lower(text)), '\\s+') AS words
  FROM documents
), grams AS (
  SELECT doc_id, source, unnest(
           list_concat(words,
             CASE WHEN len(words) >= 2
                  THEN list_transform(range(1, len(words)),
                                      i -> words[i] || ' ' || words[i + 1])
                  ELSE [] END)) AS gram
  FROM base
), feats AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(gram), 1, 8))::BIGINT % {_DSIR_BUCKETS} AS bucket
  FROM grams
), model AS (
  SELECT bucket,
         sum(CASE WHEN source = '{_DSIR_TARGET_SOURCE}' THEN 1 ELSE 0 END)
           ::BIGINT AS t_f,
         count(*)::BIGINT AS r_f
  FROM feats GROUP BY bucket
), totals AS (
  SELECT sum(t_f) AS t_tot, sum(r_f) AS r_tot FROM model
), ratio AS (
  SELECT bucket,
         ln((t_f + 0.5) / (t_tot + {_DSIR_BUCKETS} / 2))
         - ln((r_f + 0.5) / (r_tot + {_DSIR_BUCKETS} / 2)) AS log_ratio
  FROM model CROSS JOIN totals
), doc_w AS (
  SELECT doc_id, source, round(sum(c * log_ratio) + 1e-9, 4) AS w
  FROM (
    SELECT doc_id, source, bucket, count(*)::BIGINT AS c
    FROM feats GROUP BY ALL
  ) JOIN ratio USING (bucket)
  GROUP BY doc_id, source
), ranked AS (
  SELECT source, w,
         row_number() OVER (ORDER BY w DESC, doc_id) <= {_DSIR_KEEP}
           AS selected
  FROM doc_w
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN selected THEN 1 ELSE 0 END)::BIGINT AS n_selected,
       round(avg(w) + 1e-9, 4) AS avg_weight,
       round(avg(CASE WHEN selected THEN w END) + 1e-9, 4)
         AS avg_selected_weight
FROM ranked GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# weighted sampling without replacement — Efraimidis-Spirakis priorities
# ---------------------------------------------------------------------------

_WPRI_K = 100        # sample size
_WPRI_W_FLOOR = 0.01  # zero-weight guard (a 0 weight would divide by zero)


def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-WEIGHTED sample of K docs without replacement — the
    Efraimidis-Spirakis priority method, the standard distributed
    weighted sampler: each doc gets priority u^(1/w) with u a uniform
    (here a DETERMINISTIC md5-hash uniform — retry-safe, layout- and
    engine-independent, the registry's no-rand() rule) and the global
    top-K by priority IS an exact weighted sample without replacement.
    Ranking maximizes ln(u)/w (monotone in u^(1/w), numerically tamer),
    ROUNDED to 9 dp with a doc_id tiebreak so libm's last-ulp ln()
    differences can never flip the cross-engine order (the bm25
    rank-stability rule).

    Scale shape: priorities are pure codegen over the documents scan; the
    only wide op is the global top-K (a K-row TakeOrdered — no full
    sort materializes at any executor).

    Reference analog: the work-selection layer (todo + retry selection,
    J4) upgraded from membership to weighted priority.
    """
    q = text_quality_score(spark, sf_dir).select("doc_id", "quality")
    u = (
        F.expr(
            "conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10)"
        ).cast("double")
        + 1.0
    ) / 4294967297.0  # (0, 1) strictly — ln(0) can never occur
    w = F.greatest(F.col("quality"), F.lit(_WPRI_W_FLOOR))
    pri = F.round(F.log(u) / w + 1e-12, 9)
    ranked = q.select("doc_id", "quality", pri.alias("priority")).orderBy(
        F.col("priority").desc(), F.col("doc_id").asc()
    )
    # unpartitioned window over the K-row limit output (bounded input;
    # pinned by tests/test_plan_shapes.py::
    # test_global_windows_sit_above_bounded_inputs)
    return ranked.limit(_WPRI_K).select(
        F.row_number()
        .over(
            Window.orderBy(F.col("priority").desc(), F.col("doc_id").asc())
        )
        .alias("rank"),
        "doc_id",
        "quality",
        "priority",
    )


_WEIGHTED_PRIORITY_SQL = f"""
WITH q AS (
{_QUALITY_SQL}
),
pri AS (
  SELECT doc_id, quality,
         round(
           ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1.0)
              / 4294967297.0)
           / greatest(quality, {_WPRI_W_FLOOR}) + 1e-12, 9) AS priority
  FROM q
)
SELECT row_number() OVER (ORDER BY priority DESC, doc_id ASC) AS rank,
       doc_id, quality, priority
FROM pri
ORDER BY priority DESC, doc_id ASC
LIMIT {_WPRI_K}
"""


QUERIES = {
    "sample_weighted_priority": sample_weighted_priority,
    "text_token_stats": text_token_stats,
    "classifier_train_logreg": classifier_train_logreg,
    "text_quality_score": text_quality_score,
    "quality_calibration_per_source": quality_calibration_per_source,
    "text_langid_heuristic": text_langid_heuristic,
    "doc_fingerprint": doc_fingerprint,
    "sample_stratified": sample_stratified,
    "token_topk_per_lang": token_topk_per_lang,
    "decontaminate_ngram": decontaminate_ngram,
    "sample_token_budget": sample_token_budget,
    "sample_mixture_quota": sample_mixture_quota,
    "doc_intradoc_dedup": doc_intradoc_dedup,
    "text_linear_classifier": text_linear_classifier,
    "doc_crossdoc_dedup": doc_crossdoc_dedup,
    "quality_outlier_mad": quality_outlier_mad,
    "quality_psi_by_source": quality_psi_by_source,
    "sample_importance_dsir": sample_importance_dsir,
}

ORACLE = {
    "sample_weighted_priority": _WEIGHTED_PRIORITY_SQL,
    "quality_outlier_mad": _MAD_SQL,
    "quality_psi_by_source": _PSI_SQL,
    "text_token_stats": _TOKEN_STATS_SQL,
    "classifier_train_logreg": _train_logreg_sql(),
    "text_quality_score": _QUALITY_SQL,
    "quality_calibration_per_source": _CALIBRATION_SQL,
    "text_langid_heuristic": _LANGID_SQL,
    "doc_fingerprint": _FINGERPRINT_SQL,
    "sample_stratified": _SAMPLE_SQL,
    "token_topk_per_lang": _TOKEN_TOPK_SQL,
    "decontaminate_ngram": _DECON_SQL,
    "sample_token_budget": _BUDGET_SQL,
    "sample_mixture_quota": _MIXTURE_SQL,
    "doc_intradoc_dedup": _INTRADOC_SQL,
    "text_linear_classifier": _CLF_SQL,
    "doc_crossdoc_dedup": _CROSSDOC_SQL,
    "sample_importance_dsir": _DSIR_SQL,
}
