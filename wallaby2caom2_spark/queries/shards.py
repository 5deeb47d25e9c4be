"""Corpus-assembly queries: shard packing, incremental ingest dedup, and
cross-modal duplicate consistency.

These are the day-2 operations of a training-data pipeline — after the
quality filter (plans/pipeline.py) and the day-0 backfill dedup
(audio_fingerprint_neardup) have run once, the corpus lives as tables and
every later run must (a) pack kept clips into fixed-duration training
shards deterministically, (b) dedup each new ingest batch against the
persisted corpus WITHOUT re-pairing the corpus, and (c) cross-check the
two duplicate signals (audio content vs transcript text) to surface label
noise (same audio delivered with a different transcript, or vice versa).

Oracle strategy: all three replay in DuckDB from the clips cache plus the
pure-Python per-clip fixture (fixtures.py — bit-identical to the live
UDFs, pinned in tests/test_fixtures.py): the packing as one SQL window,
the dedup and consistency joins as the same banding/equality SQL the
in-corpus dedup oracle already uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import audio_fp, packing
from ..plans.pipeline import quality_filter
from .clips_flagship import clips_path_for, features_path_for, load_clips

# ---------------------------------------------------------------------------
# 1. shard packing
# ---------------------------------------------------------------------------

_BUDGET_MS = packing.DEFAULT_BUDGET_MS


def clips_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept clips → fixed-duration training shards (offset rule) → per-shard
    membership stats.

    The packing key is the clip's numeric id suffix (unique, deterministic
    corpus order); the duration is the MEASURED one (header lies were
    already dropped by the filter). The running offset is the two-pass
    distributed prefix sum (operators/packing.py) — no global window ever
    touches the corpus. ``fill_pct`` may exceed 100 by at most one clip
    (the boundary straddler; bound asserted in tests/test_packing.py).
    """
    kept = (
        quality_filter(load_clips(spark, sf_dir))
        .filter(F.col("keep"))
        .select(
            F.substring(F.col("clip_id"), -10, 10)
            .cast("long")
            .alias("order_key"),
            F.col("dur_ms_meas").cast("long").alias("dur_ms"),
        )
    )
    packed = packing.pack_by_budget(
        kept, dur_col="dur_ms", order_col="order_key", budget_ms=_BUDGET_MS
    )
    return packing.shard_summary(packed, dur_col="dur_ms", budget_ms=_BUDGET_MS)


def shard_packing_oracle(sf_dir: str) -> str:
    """DuckDB oracle: the offset-rule packing is ONE SQL window over the
    fixture's (keep, dur_ms_meas) — exact integer arithmetic end-to-end.
    A different packing order, an inclusive-vs-exclusive off-by-one in the
    prefix sum, or a wrong straddler rule all hash-mismatch."""
    path = features_path_for(sf_dir)
    return f"""
WITH kept AS (
  SELECT CAST(right(clip_id, 10) AS BIGINT) AS k,
         dur_ms_meas::BIGINT AS dur
  FROM read_parquet('{path}/*.parquet') WHERE keep
),
c AS (
  SELECT k, dur,
         sum(dur) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) - dur
           AS start_off
  FROM kept
),
assigned AS (SELECT start_off // {_BUDGET_MS} AS shard_id, dur FROM c)
SELECT shard_id, count(*)::BIGINT AS n_clips,
       sum(dur)::BIGINT AS total_ms,
       round(sum(dur) * 100.0 / {_BUDGET_MS}, 4) AS fill_pct
FROM assigned GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# 2. incremental ingest dedup against the persisted signature store
# ---------------------------------------------------------------------------


def _md5_head(col: str = "clip_id") -> F.Column:
    """First 4 md5 hex chars as a long — the engine-portable hash every
    deterministic sampling rule in the clips family keys on (DuckDB
    computes the identical value)."""
    return F.conv(F.substring(F.md5(F.col(col)), 1, 4), 16, 10).cast("long")


def audio_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-2 ingest dedup: split the corpus into an EXISTING half (its
    fingerprints stand in for the persisted signature store) and a NEW
    ingest batch; re-deliver a deterministic sample of existing clips into
    the batch under fresh ids (the cross-batch duplicate a crawler
    re-fetch produces); probe the batch against the store
    (operators/audio_fp.py ``incremental_matches`` — banded equi-join,
    never a corpus self-pair) and report the triage a real ingest run
    acts on: dup / novel / unfingerprintable counts by match distance.
    """
    clips = load_clips(spark, sf_dir)
    h = _md5_head()
    existing = clips.filter(h % 2 == 0)
    redelivered = clips.filter(h % 16 == 0).withColumn(
        "clip_id", F.concat(F.lit("ingest-"), F.col("clip_id"))
    )
    batch = clips.filter(h % 2 == 1).unionByName(redelivered)

    store_fp = audio_fp.with_fingerprint(existing).select(
        "clip_id", "fp_ok", "fp"
    )
    batch_fp = audio_fp.with_fingerprint(batch).select(
        "clip_id", "fp_ok", "fp"
    )
    best = audio_fp.incremental_matches(batch_fp, store_fp, max_hamming=3)
    status = (
        F.when(~F.col("fp_ok"), F.lit("unfingerprintable"))
        .when(F.col("match_id").isNotNull(), F.lit("dup"))
        .otherwise(F.lit("novel"))
    )
    return (
        batch_fp.join(best, "clip_id", "left")
        .withColumn("status", status)
        .groupBy("status", "hamming")
        .agg(F.count("*").alias("n_clips"))
        .orderBy("status", "hamming")
    )


def incremental_dedup_oracle(sf_dir: str) -> str:
    """DuckDB oracle: the whole incremental probe replays in SQL from the
    fixture's fingerprints — store/batch md5 split, ingest redelivery,
    shared zero-band hot-key policy, banded join, hamming verify, best
    (min-hamming) match per batch clip, triage counts."""
    path = features_path_for(sf_dir)
    return f"""
WITH fx AS (
  SELECT clip_id, fp_ok, fp,
         ('0x' || substr(md5(clip_id), 1, 4))::BIGINT AS h
  FROM read_parquet('{path}/*.parquet')
),
store AS (SELECT clip_id, fp_ok, fp FROM fx WHERE h % 2 = 0),
batch AS (
  SELECT clip_id, fp_ok, fp FROM fx WHERE h % 2 = 1
  UNION ALL
  SELECT 'ingest-' || clip_id, fp_ok, fp FROM fx WHERE h % 16 = 0
),
sb AS (
  SELECT clip_id, fp, b.band_idx,
         (fp >> (b.band_idx * 15)) % 32768 AS band_bits
  FROM store, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
  WHERE fp_ok
),
bb AS (
  SELECT clip_id, fp, b.band_idx,
         (fp >> (b.band_idx * 15)) % 32768 AS band_bits
  FROM batch, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
  WHERE fp_ok
),
cand AS (
  SELECT DISTINCT n.clip_id, s.clip_id AS match_id, n.fp AS fpn, s.fp AS fps
  FROM (SELECT * FROM bb WHERE band_bits != 0) n
  JOIN (SELECT * FROM sb WHERE band_bits != 0) s
    ON n.band_idx = s.band_idx AND n.band_bits = s.band_bits
),
best AS (
  SELECT clip_id, min(bit_count(xor(fpn, fps)))::INT AS hamming
  FROM cand WHERE bit_count(xor(fpn, fps)) <= 3
  GROUP BY clip_id
)
SELECT CASE WHEN NOT b.fp_ok THEN 'unfingerprintable'
            WHEN m.clip_id IS NOT NULL THEN 'dup'
            ELSE 'novel' END AS status,
       m.hamming,
       count(*)::BIGINT AS n_clips
FROM batch b LEFT JOIN best m ON b.clip_id = m.clip_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# 3. cross-modal duplicate consistency (label-noise detection)
# ---------------------------------------------------------------------------


def crossmodal_pair_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-check the AUDIO duplicate signal against the TEXT duplicate
    signal over a corpus with three planted redelivery classes:

    - ``dupb-``: byte-identical audio + identical transcript → a clean
      redelivery, both signals fire (drop one copy, keep either label);
    - ``dupa-``: byte-identical audio + a DIFFERENT transcript → label
      noise — two transcripts claim the same recording; only the audio
      signal fires, and a real pipeline routes the pair to re-labeling;
    - ``dupt-``: identical transcript + an undecodable payload → only the
      text signal fires (plus any natural transcript collisions in the
      base corpus — short sentences do repeat).

    Audio pairs come from the banded fingerprint join (hamming ≤ 3), text
    pairs from an equality self-join keyed on ``md5(transcript)`` (hash
    key for the exchange, full-string verify after — the same
    key-then-verify shape as the LSH families). The full outer join of the
    two pair sets classifies every duplicate pair; the count by class is
    the corpus label-noise report.
    """
    clips = load_clips(spark, sf_dir)
    m = _md5_head() % 24
    dup_both = clips.filter(m == 1).withColumn(
        "clip_id", F.concat(F.lit("dupb-"), F.col("clip_id"))
    )
    dup_audio = (
        clips.filter(m == 2)
        .withColumn("clip_id", F.concat(F.lit("dupa-"), F.col("clip_id")))
        .withColumn(
            "transcript", F.concat(F.lit("REPLACED "), F.col("clip_id"))
        )
    )
    dup_text = (
        clips.filter(m == 3)
        .withColumn("clip_id", F.concat(F.lit("dupt-"), F.col("clip_id")))
        .withColumn("bytes", F.lit(b""))
    )
    corpus = (
        clips.unionByName(dup_both)
        .unionByName(dup_audio)
        .unionByName(dup_text)
    )

    apairs = audio_fp.banded_neardup_pairs(
        audio_fp.with_fingerprint(corpus), max_hamming=3
    ).select("clip_a", "clip_b")

    t = corpus.select(
        "clip_id", "transcript", F.md5("transcript").alias("tkey")
    )
    lt, rt = t.alias("l"), t.alias("r")
    tpairs = (
        lt.join(
            rt,
            (F.col("l.tkey") == F.col("r.tkey"))
            & (F.col("l.transcript") == F.col("r.transcript"))
            & (F.col("l.clip_id") < F.col("r.clip_id")),
        )
        .select(
            F.col("l.clip_id").alias("clip_a"),
            F.col("r.clip_id").alias("clip_b"),
        )
    )

    a = apairs.withColumn("has_a", F.lit(True))
    tx = tpairs.withColumn("has_t", F.lit(True))
    merged = a.join(tx, ["clip_a", "clip_b"], "full_outer")
    dup_class = (
        F.when(F.col("has_a") & F.col("has_t"), F.lit("both"))
        .when(F.col("has_a"), F.lit("audio_only"))
        .otherwise(F.lit("text_only"))
    )
    return merged.withColumn("dup_class", dup_class).select(
        "clip_a", "clip_b", "dup_class"
    )


def crossmodal_dup_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class duplicate-pair counts — the corpus label-noise report
    (see ``crossmodal_pair_table`` for the pair-level semantics and the
    planted redelivery classes; pair-level assertions live in
    tests/test_shards_queries.py)."""
    return (
        crossmodal_pair_table(spark, sf_dir)
        .groupBy("dup_class")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("dup_class")
    )


def crossmodal_oracle(sf_dir: str) -> str:
    """DuckDB oracle: transcripts come from the clips cache, fingerprints
    from the fixture; the three redelivery classes, both pair joins and the
    classification replay in SQL. The ``dupt-`` rows carry an empty
    payload, whose decode failure (→ no fingerprint) is a pinned decode
    contract (tests/test_audio.py), so the oracle sets fp_ok=false for
    them directly."""
    clips_path = clips_path_for(sf_dir)
    fx_path = features_path_for(sf_dir)
    return f"""
WITH cl AS (
  SELECT clip_id, transcript FROM read_parquet('{clips_path}/*.parquet')
),
fx AS (
  SELECT clip_id, fp_ok, fp FROM read_parquet('{fx_path}/*.parquet')
),
base AS (
  SELECT c.clip_id, c.transcript, f.fp_ok, f.fp,
         ('0x' || substr(md5(c.clip_id), 1, 4))::BIGINT % 24 AS m
  FROM cl c JOIN fx f ON c.clip_id = f.clip_id
),
corpus AS (
  SELECT clip_id, transcript, fp_ok, fp FROM base
  UNION ALL
  SELECT 'dupb-' || clip_id, transcript, fp_ok, fp FROM base WHERE m = 1
  UNION ALL
  SELECT 'dupa-' || clip_id, 'REPLACED dupa-' || clip_id, fp_ok, fp
  FROM base WHERE m = 2
  UNION ALL
  SELECT 'dupt-' || clip_id, transcript, false, 0 FROM base WHERE m = 3
),
bands AS (
  SELECT clip_id, fp, b.band_idx,
         (fp >> (b.band_idx * 15)) % 32768 AS band_bits
  FROM corpus, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
  WHERE fp_ok
),
live AS (SELECT * FROM bands WHERE band_bits != 0),
apairs AS (
  SELECT DISTINCT l.clip_id AS clip_a, r.clip_id AS clip_b,
                  l.fp AS fa, r.fp AS fb
  FROM live l JOIN live r
    ON l.band_idx = r.band_idx AND l.band_bits = r.band_bits
   AND l.clip_id < r.clip_id
),
av AS (
  SELECT clip_a, clip_b FROM apairs WHERE bit_count(xor(fa, fb)) <= 3
),
tpairs AS (
  SELECT l.clip_id AS clip_a, r.clip_id AS clip_b
  FROM corpus l JOIN corpus r
    ON md5(l.transcript) = md5(r.transcript)
   AND l.transcript = r.transcript
   AND l.clip_id < r.clip_id
),
merged AS (
  SELECT coalesce(a.clip_a, t.clip_a) AS clip_a,
         a.clip_a IS NOT NULL AS has_a,
         t.clip_a IS NOT NULL AS has_t
  FROM av a FULL OUTER JOIN tpairs t
    ON a.clip_a = t.clip_a AND a.clip_b = t.clip_b
)
SELECT CASE WHEN has_a AND has_t THEN 'both'
            WHEN has_a THEN 'audio_only'
            ELSE 'text_only' END AS dup_class,
       count(*)::BIGINT AS n_pairs
FROM merged GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# 4. curriculum binning — composite quality score → per-language deciles
# ---------------------------------------------------------------------------


def _quality_score() -> F.Column:
    """Composite per-clip quality score in pure codegen over the filter's
    own output columns: language-ID confidence (higher = better),
    perplexity (lower = better, saturated at 10k), signal level (RMS,
    saturated at 0.25). Weights are a policy knob; what matters here is
    that the arithmetic is deterministic double math BOTH engines compute
    bit-identically, so the decile boundaries cannot drift."""
    return (
        F.col("lang_conf") * 0.5
        + (1.0 - F.least(F.col("ppl") / 10000.0, F.lit(1.0))) * 0.3
        + F.least(F.col("rms") * 4.0, F.lit(1.0)) * 0.2
    )


def clips_quality_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning bins: kept clips scored by the composite quality
    signal, split into per-language deciles (NTILE over score with a
    clip_id tiebreak for a total order), summarized per (lang, decile) —
    the table a curriculum sampler consumes ("start training on decile 10,
    anneal toward 1").

    Scale shape: the NTILE window partitions by ``lang`` — parallel across
    languages, one partition per language. At 10^12 rows the per-language
    partition is itself too big for one task; the scale path is
    ``clips_quality_curriculum_approx`` (histogram-quantile deciles, also
    oracle-checked) behind the ``clips_quality_curriculum_auto`` row-count
    switch — parity and switch covered by tests/test_curriculum_switch.py.
    This exact form remains the reference semantics.
    """
    from pyspark.sql.window import Window

    kept = (
        quality_filter(load_clips(spark, sf_dir))
        .filter(F.col("keep"))
        .select("clip_id", "lang", "lang_conf", "ppl", "rms")
        .withColumn("score", _quality_score())
    )
    w = Window.partitionBy("lang").orderBy("score", "clip_id")
    return (
        kept.withColumn("decile", F.ntile(10).over(w))
        .groupBy("lang", "decile")
        .agg(
            F.count("*").alias("n_clips"),
            F.round(F.avg("score") + 1e-9, 4).alias("avg_score"),
            F.round(F.avg("ppl") + 1e-9, 2).alias("avg_ppl"),
        )
        .orderBy("lang", "decile")
    )


# --- approximate-quantile path (the named 10^12-row switch) ----------------
#
# NTILE's per-language window sorts every row of the language — at 10^12
# rows one language is far too big for a single task's sort. The scale
# path bins by FIXED-GRID HISTOGRAM quantiles instead: the score is in
# [0,1] by construction (_quality_score is a 0.5/0.3/0.2 blend of
# saturated terms), so quantizing it to a _CURR_GRID-step grid collapses
# the corpus to a ≤ |langs| x _CURR_GRID histogram in ONE map-side-combined
# shuffle; decile thresholds then come from the cumulative histogram
# (windows over the bounded histogram only) and every clip in a grid
# bucket shares the decile of the bucket's cumulative rank. Deterministic
# by construction — unlike a GK/approx_percentile sketch it is exactly
# replayable in the DuckDB oracle, so BOTH curriculum paths sit under the
# full rows+schema+hash gate. Rank error ≤ the mass of one grid bucket
# per decile boundary (tolerance the parity test derives and asserts).

_CURR_GRID = 2000
# auto-switch: exact NTILE below, histogram deciles at/above this input
# row count (metadata-only parquet count — no scan)
_CURR_APPROX_ROWS = 100_000_000


def clips_quality_curriculum_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Histogram-quantile curriculum bins — approximate decile ASSIGNMENT
    with exact, oracle-checkable semantics (see block comment above)."""
    from pyspark.sql.window import Window

    kept = (
        quality_filter(load_clips(spark, sf_dir))
        .filter(F.col("keep"))
        .select("lang", "ppl", _quality_score().alias("score"))
    )
    gb = F.least(
        F.floor(F.col("score") * _CURR_GRID).cast("int"),
        F.lit(_CURR_GRID - 1),
    )
    hist = kept.groupBy("lang", gb.alias("gb")).agg(
        F.count("*").alias("n"),
        F.sum("score").alias("s_score"),
        F.sum("ppl").alias("s_ppl"),
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("gb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("lang")
    binned = hist.select(
        "lang",
        "n",
        "s_score",
        "s_ppl",
        F.least(
            F.ceil(F.sum("n").over(w_cum) * 10 / F.sum("n").over(w_all))
            .cast("int"),
            F.lit(10),
        ).alias("decile"),
    )
    return (
        binned.groupBy("lang", "decile")
        .agg(
            F.sum("n").alias("n_clips"),
            F.round(F.sum("s_score") / F.sum("n") + 1e-9, 4).alias(
                "avg_score"
            ),
            F.round(F.sum("s_ppl") / F.sum("n") + 1e-9, 2).alias("avg_ppl"),
        )
        .orderBy("lang", "decile")
    )


def quality_curriculum_approx_oracle(sf_dir: str) -> str:
    """DuckDB replay of the histogram-decile rule: same grid, same
    cumulative-rank assignment, same per-bin aggregates."""
    path = features_path_for(sf_dir)
    return f"""
WITH kept AS (
  SELECT lang, ppl,
         lang_conf * 0.5
           + (1.0 - least(ppl / 10000.0, 1.0)) * 0.3
           + least(rms * 4.0, 1.0) * 0.2 AS score
  FROM read_parquet('{path}/*.parquet') WHERE keep
),
hist AS (
  SELECT lang,
         least(floor(score * {_CURR_GRID})::INTEGER, {_CURR_GRID - 1}) AS gb,
         count(*)::BIGINT AS n, sum(score) AS s_score, sum(ppl) AS s_ppl
  FROM kept GROUP BY 1, 2
),
binned AS (
  SELECT lang, n, s_score, s_ppl,
         least(ceil(sum(n) OVER (PARTITION BY lang ORDER BY gb
                                 ROWS UNBOUNDED PRECEDING) * 10.0
                    / sum(n) OVER (PARTITION BY lang))::INTEGER,
               10) AS decile
  FROM hist
)
SELECT lang, decile, sum(n)::BIGINT AS n_clips,
       round(sum(s_score) / sum(n) + 1e-9, 4) AS avg_score,
       round(sum(s_ppl) / sum(n) + 1e-9, 2) AS avg_ppl
FROM binned GROUP BY 1, 2 ORDER BY 1, 2
"""


def clips_quality_curriculum_auto(
    spark: SparkSession,
    sf_dir: str,
    approx_rows: int = _CURR_APPROX_ROWS,
) -> DataFrame:
    """The row-count switch between the two curriculum paths: exact NTILE
    (reference semantics) below ``approx_rows`` input clips, histogram
    deciles at/above it. The input-table count is parquet-metadata-only
    (no column scan). Covered by tests/test_curriculum_switch.py."""
    n = spark.read.parquet(clips_path_for(sf_dir)).count()
    if n >= approx_rows:
        return clips_quality_curriculum_approx(spark, sf_dir)
    return clips_quality_curriculum(spark, sf_dir)


def quality_curriculum_oracle(sf_dir: str) -> str:
    """DuckDB oracle: the score, the per-language NTILE (same SQL-standard
    remainder rule) and the per-bin aggregates replay from the fixture's
    filter columns."""
    path = features_path_for(sf_dir)
    return f"""
WITH kept AS (
  SELECT clip_id, lang,
         lang_conf * 0.5
           + (1.0 - least(ppl / 10000.0, 1.0)) * 0.3
           + least(rms * 4.0, 1.0) * 0.2 AS score,
         ppl
  FROM read_parquet('{path}/*.parquet') WHERE keep
),
binned AS (
  SELECT lang, score, ppl,
         ntile(10) OVER (PARTITION BY lang ORDER BY score, clip_id)
           AS decile
  FROM kept
)
SELECT lang, decile, count(*)::BIGINT AS n_clips,
       round(avg(score) + 1e-9, 4) AS avg_score,
       round(avg(ppl) + 1e-9, 2) AS avg_ppl
FROM binned GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# 5. deterministic training-order shuffle
# ---------------------------------------------------------------------------

_SHUFFLE_SEED = "epoch0"
_SHUFFLE_SHARDS = 64
_KEY_HEX = 12  # 48-bit key: exact in int64 AND in DuckDB's double arithmetic
# the shard cut is the top log2(N_SHARDS) key bits — derived ONCE here and
# consumed by the Spark plan, the oracle SQL, and the tests (review
# finding: three hand-maintained copies of "42" could desynchronize)
_SHARD_BITS = _SHUFFLE_SHARDS.bit_length() - 1
_SHUFFLE_SHIFT = 4 * _KEY_HEX - _SHARD_BITS


def _shuffle_key(seed: str, col: str = "clip_id") -> F.Column:
    """48-bit engine-portable shuffle key: md5(seed ‖ clip_id) head. The
    full-width head (vs _md5_head's 16 bits) makes ties astronomically
    rare so the key alone is a total training order; DuckDB computes the
    identical value."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.col(col))), 1, _KEY_HEX),
        16,
        10,
    ).cast("long")


def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global training-order shuffle → ordered shard ranges.

    Before training, the kept corpus must be read in a decorrelated,
    RESUMABLE order — `orderBy(rand())` is neither (non-deterministic
    across retries, and a global sort). This operator keys every kept clip
    with a seeded content-independent hash (new epoch = new seed, same
    plan) and cuts the KEY SPACE, not the row count, into contiguous
    shards: ``shard_id = key >> 42`` (top 6 of 48 key bits → 64 shards).
    Uniform hash keys make shards
    statistically equal-sized with zero coordination — the 100 TB path is
    a pure map-side assignment (each row knows its shard from its own key)
    followed by one slim groupBy; writing the actual shards is the
    existing export plan partitioned by this column, with intra-shard
    order = the key order.

    The output proves the two invariants a shuffle must have: shards
    partition the key space in order (``follows_prev`` — each shard's min
    key lands above the previous shard's max; window over N_SHARDS rows,
    not corpus rows), and the shuffle decorrelates content (per-shard
    ``avg_ppl`` hugs the corpus mean; a sorted-by-quality order would
    stripe it). Epoch determinism + seed sensitivity pinned in
    tests/test_shuffle_order.py.

    Reference analog: the reference processes its work list in
    deterministic todo-file order (``wallaby2caom2/composable.py``) — this
    is that contract lifted to a seeded, resumable corpus-scale order.
    """
    kept = (
        quality_filter(load_clips(spark, sf_dir))
        .filter(F.col("keep"))
        .select(
            _shuffle_key(_SHUFFLE_SEED).alias("k"),
            F.col("ppl"),
        )
    )
    # key-space cut in EXACT integer arithmetic: 64 shards = top 6 key bits
    # (k·N/2^48 via double division would go inexact past 2^53)
    shards = kept.groupBy(
        F.shiftright(F.col("k"), _SHUFFLE_SHIFT).alias("shard_id")
    ).agg(
        F.count("*").alias("n_clips"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
        F.round(F.avg("ppl") + 1e-9, 4).alias("avg_ppl"),
    )
    from pyspark.sql import Window

    # unpartitioned window over the per-shard totals aggregate (bounded
    # by shard count; pinned by tests/test_plan_shapes.py::
    # test_global_windows_sit_above_bounded_inputs)
    w = Window.orderBy("shard_id")
    return (
        shards.withColumn(
            "follows_prev",
            F.coalesce(
                F.col("min_key") > F.lag("max_key").over(w), F.lit(True)
            ),
        )
        .orderBy("shard_id")
    )


def shuffle_order_oracle(sf_dir: str) -> str:
    """DuckDB replay: identical md5-head keys over the fixture's kept rows,
    identical key-space cut, identical window. A wrong radix, a row-count
    (vs key-space) cut, or a broken range invariant all hash-mismatch."""
    path = features_path_for(sf_dir)
    return f"""
WITH kept AS (
  SELECT CAST(('0x' || substring(md5('{_SHUFFLE_SEED}' || clip_id), 1, {_KEY_HEX})) AS BIGINT) AS k,
         ppl
  FROM read_parquet('{path}/*.parquet') WHERE keep
),
s AS (
  SELECT k // {2**_SHUFFLE_SHIFT} AS shard_id,
         count(*)::BIGINT AS n_clips,
         min(k)::BIGINT AS min_key, max(k)::BIGINT AS max_key,
         round(avg(ppl) + 1e-9, 4) AS avg_ppl
  FROM kept GROUP BY 1
)
SELECT shard_id, n_clips, min_key, max_key, avg_ppl,
       coalesce(min_key > lag(max_key) OVER (ORDER BY shard_id), TRUE)
         AS follows_prev
FROM s ORDER BY shard_id
"""


QUERIES = {
    "clips_shard_packing": clips_shard_packing,
    "audio_incremental_dedup": audio_incremental_dedup,
    "crossmodal_dup_consistency": crossmodal_dup_consistency,
    "clips_quality_curriculum": clips_quality_curriculum,
    "clips_quality_curriculum_approx": clips_quality_curriculum_approx,
    "corpus_shuffle_order": corpus_shuffle_order,
}

# oracles embed sf-dependent fixture paths → built at oracle_sql() time
ORACLE: dict[str, str] = {}

ORACLE_BUILDERS = {
    "clips_shard_packing": shard_packing_oracle,
    "audio_incremental_dedup": incremental_dedup_oracle,
    "crossmodal_dup_consistency": crossmodal_oracle,
    "clips_quality_curriculum": quality_curriculum_oracle,
    "clips_quality_curriculum_approx": quality_curriculum_approx_oracle,
    "corpus_shuffle_order": shuffle_order_oracle,
}
