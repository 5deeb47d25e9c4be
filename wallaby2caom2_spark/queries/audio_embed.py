"""Audio semantic-embedding queries: the vector machinery of
queries/similarity.py applied to AUDIO CONTENT.

``operators/embed.py`` turns each clip into a 24-dim pooled-filterbank
vector (one Arrow crossing, payload dies in the worker); these queries run
the corpus-scale vector patterns over it — norm profiling and
hyperplane-LSH-bucketed cosine near-dup — with DuckDB oracles replaying
every step from the fixture's bit-identical persisted vectors
(``list_dot_product`` on the same float64 lists).

Where the fingerprint family answers "same recording?", this family
answers "similar-sounding recording?" — the recall net behind exact
content dedup (a re-recording or heavy re-encode that breaks the
fingerprint still lands in the same cosine neighborhood).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel
from pyspark.sql import functions as F

from ..operators import embed
from .clips_flagship import features_path_for, load_clips

N_PLANES = 8


def _plane(h: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 — the same constants
    are inlined into the Spark plan and the oracle SQL (the
    queries/similarity.py pattern, at the audio embedding's 24 dims)."""
    return [
        int(hashlib.md5(f"aemb_{h}_{i}".encode()).hexdigest()[:8], 16) / 2**31
        - 1.0
        for i in range(embed.EMB_DIM)
    ]


PLANES: list[list[float]] = [_plane(h) for h in range(N_PLANES)]


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _sql_plane(h: int) -> str:
    return "[" + ", ".join(repr(v) for v in PLANES[h]) + "]"


def audio_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding health profile: containment split plus the norm statistics
    a retrieval stack monitors (collapsed norms = dead embedder)."""
    e = embed.embed_clips(load_clips(spark, sf_dir))
    norm = F.sqrt(_dot(F.col("emb"), F.col("emb")))
    return (
        e.groupBy("emb_ok")
        .agg(
            F.count("*").alias("n_clips"),
            F.round(F.avg(norm) + 1e-9, 4).alias("avg_norm"),
            F.round(F.max(norm) + 1e-9, 4).alias("max_norm"),
        )
        .orderBy("emb_ok")
    )


def embedding_stats_oracle(sf_dir: str) -> str:
    path = features_path_for(sf_dir)
    return f"""
SELECT emb_ok, count(*)::BIGINT AS n_clips,
       round(avg(sqrt(list_dot_product(emb, emb))) + 1e-9, 4) AS avg_norm,
       round(max(sqrt(list_dot_product(emb, emb))) + 1e-9, 4) AS max_norm
FROM read_parquet('{path}/*.parquet')
GROUP BY 1 ORDER BY 1
"""


# sorted-neighborhood window: within a bucket, each clip is paired with
# its SN_W successors in projection order. Pairs per bucket = O(n·W), so
# total candidates are O(N·W) REGARDLESS of bucket skew; a bucket with
# n ≤ SN_W+1 members gets exact all-pairs automatically.
SN_W = 64


def audio_semantic_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similar-sounding clip pairs: embeddings → 8-hyperplane LSH bucket →
    SORTED-NEIGHBORHOOD candidate pairs within the bucket → cosine →
    histogram of high-similarity (≥0.98) pairs.

    Scale shape — learned at the sf0.1 sweep: a plain within-bucket
    self-join is NOT bucket-bounded when the embedding distribution
    collapses into a few modes (measured: 37k of 95k clips in ONE of the
    256 sign buckets → 1.2e9 candidate pairs; adding planes does not
    split a cluster tighter than the hyperplane margins — 31k still
    co-bucket at 16 planes). Candidate generation is therefore the
    sorted-neighborhood method on top of the LSH block: members of a
    bucket are ordered by their (deterministic) projection on plane 0,
    and each pairs with its ``SN_W`` successors — an equi-join on
    (bucket, position), O(N·SN_W) pairs total under ANY skew, exact
    all-pairs for small buckets. Near-identical embeddings have
    near-identical projections, so cos≥0.98 pairs land within the window
    with high probability; the window size (and the plane count) is the
    explicit recall dial. Per-bucket ordering is a window sort bounded by
    the bucket, never a global sort.
    """
    from pyspark.sql.window import Window

    e = embed.embed_clips(load_clips(spark, sf_dir)).filter(F.col("emb_ok"))
    bucket = F.lit(0)
    for h in range(N_PLANES):
        plane = F.array(*[F.lit(v) for v in PLANES[h]])
        bucket = bucket + F.when(_dot(F.col("emb"), plane) > 0, 1 << h).otherwise(0)
    plane0 = F.array(*[F.lit(v) for v in PLANES[0]])
    b = e.select(
        "clip_id",
        "emb",
        bucket.cast("int").alias("bucket"),
        F.sqrt(_dot(F.col("emb"), F.col("emb"))).alias("nrm"),
        _dot(F.col("emb"), plane0).alias("proj"),
    )
    pos_w = Window.partitionBy("bucket").orderBy("proj", "clip_id")
    r = b.withColumn("pos", F.row_number().over(pos_w))
    lhs = r.select(
        F.col("bucket").alias("l_bucket"),
        F.col("emb").alias("l_emb"),
        F.col("nrm").alias("l_nrm"),
        F.col("pos").alias("l_pos"),
        F.explode(F.sequence(F.lit(1), F.lit(SN_W))).alias("off"),
    ).withColumn("t_pos", F.col("l_pos") + F.col("off"))
    # per-pair dot stays the higher-order fold: an A/B at sf0.1 measured
    # the fold ~2x FASTER than an unrolled getItem product chain (11-12 s
    # vs 20-21 s for this query; same 2x on the 64-dim brute-force top-k)
    # — Spark 4 evaluates array folds efficiently while the giant
    # unrolled expression defeats codegen/JIT. Keep the fold.
    pairs = lhs.join(
        r,
        (F.col("l_bucket") == F.col("bucket"))
        & (F.col("t_pos") == F.col("pos")),
    ).select(
        F.round(
            _dot(F.col("l_emb"), F.col("emb"))
            / (F.col("l_nrm") * F.col("nrm"))
            + 1e-9,
            2,
        ).alias("cos_sim")
    )
    return (
        pairs.filter(F.col("cos_sim") >= 0.98)
        .groupBy("cos_sim")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("cos_sim")
    )


def semantic_neardup_oracle(sf_dir: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(emb, {_sql_plane(h)}) > 0 "
        f"THEN {1 << h} ELSE 0 END)"
        for h in range(N_PLANES)
    )
    path = features_path_for(sf_dir)
    # the off-table keeps the oracle's pair generation an EQUI-join on
    # (bucket, pos) too — a BETWEEN range condition would hash-join on
    # bucket alone and regrow the quadratic inside the hot bucket
    return f"""
WITH e AS (
  SELECT clip_id, emb, ({terms})::INTEGER AS bucket,
         sqrt(list_dot_product(emb, emb)) AS nrm,
         list_dot_product(emb, {_sql_plane(0)}) AS proj
  FROM read_parquet('{path}/*.parquet') WHERE emb_ok
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY proj, clip_id)
           AS pos
  FROM e
),
offs AS (SELECT unnest(generate_series(1, {SN_W})) AS off),
-- t_pos is hoisted into a projection so BOTH join equalities are plain
-- column references: left in the ON clause as `r2.pos = l.pos + off`,
-- DuckDB hash-joins on bucket alone and evaluates the position match as
-- a residual — quadratic again inside the hot bucket (measured 373 s at
-- sf0.1 vs 3 s with the hoisted key)
lhs AS (SELECT l.emb, l.nrm, l.bucket, l.pos + off AS t_pos
        FROM r l CROSS JOIN offs),
pairs AS (
  SELECT round(list_dot_product(lhs.emb, r2.emb) / (lhs.nrm * r2.nrm)
               + 1e-9, 2) AS cos_sim
  FROM lhs JOIN r r2 ON r2.bucket = lhs.bucket AND r2.pos = lhs.t_pos
)
SELECT cos_sim, count(*)::BIGINT AS n_pairs
FROM pairs WHERE cos_sim >= 0.98
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# recall eval for the sorted-neighborhood candidate generator (round-4
# verdict #5): the production chain is an approximation twice over — the
# LSH bucket boundary AND the window W — so measure it, don't guess.
# ---------------------------------------------------------------------------

_EVAL_MOD = 37  # clip-suffix-gated eval subset; at 10^12 clips tighten the
                # gate so the subset stays ~10^4 (exact ground truth costs
                # subset² — an explicit dial, never corpus-wide)
_EVAL_COS = 0.98


def _eval_gate() -> F.Column:
    """Deterministic subset gate on the clip_id's numeric suffix — the
    dedup_lsh_recall_eval pattern (queries/dedup.py) at the audio tier."""
    return F.substring(F.col("clip_id"), -10, 10).cast("int") % _EVAL_MOD == 0


def audio_semantic_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine evaluation of the semantic-neardup candidate generator:
    on a deterministic clip-gated subset, compute the EXACT all-pairs
    cosine ground truth (cos ≥ 0.98, the production threshold), run the
    FULL production candidate chain (8-plane LSH bucket → projection
    ranking over the WHOLE corpus → SN_W sorted-neighborhood pairs), and
    measure BOTH approximation layers separately:

    - ``pair_recall`` — true pairs the window surfaces DIRECTLY. In a
      collapsed-embedding region the truth graph is a dense clique
      (measured at sf0.01: ~40% of subset pairs clear 0.98), and an
      O(N·SN_W) generator cannot — by design — enumerate a clique's
      O(n²) pairs, so this number is LOW there and rises with SN_W.
    - ``bucket_recall`` — true pairs whose ends share an LSH bucket.
      Because the window always links pos i to i+1, every bucket is ONE
      connected component of the candidate graph, so this IS the
      component-level recall — the fraction of true pairs the downstream
      dedup (connected components → keeper election) actually groups
      together, and the ceiling any window size can reach. The gap
      between bucket_recall and 1.0 is the hyperplane-boundary miss; the
      gap between pair_recall and bucket_recall is the window miss.
    - ``precision`` — candidates that verify at the threshold.

    Scale shape: the quadratic ground truth is confined to the gated
    subset (subset² is the dial); the candidate chain is the production
    O(N·SN_W) plan over the full corpus, so positions and bucket
    assignments are exactly what production sees — the eval cannot
    flatter the generator by re-ranking inside the subset. The embedded
    frame is persisted once (slim rows) because four report legs read it.
    """
    e = embed.embed_clips(load_clips(spark, sf_dir))
    return recall_eval_frame(e)


def recall_eval_frame(e: DataFrame) -> DataFrame:
    """The eval over any (clip_id, emb, emb_ok) frame — split out so the
    pytest pin can plant synthetic embeddings exhibiting each failure
    mode (hyperplane-boundary miss, window miss, direct hit) and assert
    the report attributes every one to the right counter."""
    from pyspark.sql.window import Window

    e = e.filter(F.col("emb_ok"))
    bucket = F.lit(0)
    for h in range(N_PLANES):
        plane = F.array(*[F.lit(v) for v in PLANES[h]])
        bucket = bucket + F.when(
            _dot(F.col("emb"), plane) > 0, 1 << h
        ).otherwise(0)
    plane0 = F.array(*[F.lit(v) for v in PLANES[0]])
    b = e.select(
        "clip_id",
        "emb",
        bucket.cast("int").alias("bucket"),
        F.sqrt(_dot(F.col("emb"), F.col("emb"))).alias("nrm"),
        _dot(F.col("emb"), plane0).alias("proj"),
    ).persist(StorageLevel.DISK_ONLY)
    pos_w = Window.partitionBy("bucket").orderBy("proj", "clip_id")
    r = b.withColumn("pos", F.row_number().over(pos_w))
    lhs = r.select(
        F.col("clip_id").alias("l_id"),
        F.col("bucket").alias("l_bucket"),
        F.col("pos").alias("l_pos"),
        F.explode(F.sequence(F.lit(1), F.lit(SN_W))).alias("off"),
    ).withColumn("t_pos", F.col("l_pos") + F.col("off"))
    cand = lhs.join(
        r,
        (F.col("l_bucket") == F.col("bucket"))
        & (F.col("t_pos") == F.col("pos")),
    ).select(
        F.least(F.col("l_id"), F.col("clip_id")).alias("id_a"),
        F.greatest(F.col("l_id"), F.col("clip_id")).alias("id_b"),
    )
    sub = b.filter(_eval_gate()).select("clip_id", "emb", "nrm", "bucket")
    # subset-restricted candidates: both endpoints inside the gate
    ids_a = sub.select(F.col("clip_id").alias("id_a"))
    ids_b = sub.select(F.col("clip_id").alias("id_b"))
    cand_sub = cand.join(ids_a, "id_a", "left_semi").join(
        ids_b, "id_b", "left_semi"
    )
    la = sub.select(
        F.col("clip_id").alias("id_a"),
        F.col("emb").alias("ea"),
        F.col("nrm").alias("na"),
        F.col("bucket").alias("ba"),
    )
    lb = sub.select(
        F.col("clip_id").alias("id_b"),
        F.col("emb").alias("eb"),
        F.col("nrm").alias("nb"),
        F.col("bucket").alias("bb"),
    )
    # the cross join IS the documented intent: exact ground truth bounded
    # by the gate (subset² pairs), the production threshold's rounding
    cos = F.round(
        _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")) + 1e-9,
        2,
    )
    truth = (
        la.crossJoin(lb)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= _EVAL_COS)
        .select(
            "id_a",
            "id_b",
            (F.col("ba") == F.col("bb")).alias("same_bucket"),
        )
    )
    found = truth.join(cand_sub, ["id_a", "id_b"], "left_semi")
    stats = (
        sub.agg(F.count("*").alias("n_clips_eval"))
        .crossJoin(
            truth.agg(
                F.count("*").alias("true_pairs"),
                F.coalesce(
                    F.sum(F.col("same_bucket").cast("long")), F.lit(0)
                ).alias("cobucket_pairs"),
            )
        )
        .crossJoin(cand_sub.agg(F.count("*").alias("cand_pairs")))
        .crossJoin(found.agg(F.count("*").alias("found_pairs")))
    )
    return stats.select(
        "n_clips_eval",
        "true_pairs",
        "cand_pairs",
        "found_pairs",
        "cobucket_pairs",
        F.when(
            F.col("true_pairs") > 0,
            F.round(F.col("found_pairs") / F.col("true_pairs") + 1e-9, 4),
        ).alias("pair_recall"),
        F.when(
            F.col("true_pairs") > 0,
            F.round(F.col("cobucket_pairs") / F.col("true_pairs") + 1e-9, 4),
        ).alias("bucket_recall"),
        F.when(
            F.col("cand_pairs") > 0,
            F.round(F.col("found_pairs") / F.col("cand_pairs") + 1e-9, 4),
        ).alias("precision"),
    )


def semantic_recall_eval_oracle(sf_dir: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(emb, {_sql_plane(h)}) > 0 "
        f"THEN {1 << h} ELSE 0 END)"
        for h in range(N_PLANES)
    )
    path = features_path_for(sf_dir)
    return f"""
WITH e AS (
  SELECT clip_id, emb, ({terms})::INTEGER AS bucket,
         sqrt(list_dot_product(emb, emb)) AS nrm,
         list_dot_product(emb, {_sql_plane(0)}) AS proj
  FROM read_parquet('{path}/*.parquet') WHERE emb_ok
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY proj, clip_id)
           AS pos
  FROM e
),
offs AS (SELECT unnest(generate_series(1, {SN_W})) AS off),
lhs AS (SELECT l.clip_id AS l_id, l.bucket, l.pos + off AS t_pos
        FROM r l CROSS JOIN offs),
cand AS (
  SELECT least(lhs.l_id, r2.clip_id) AS id_a,
         greatest(lhs.l_id, r2.clip_id) AS id_b
  FROM lhs JOIN r r2 ON r2.bucket = lhs.bucket AND r2.pos = lhs.t_pos
),
sub AS (
  SELECT clip_id, emb, nrm, bucket FROM e
  WHERE right(clip_id, 10)::INTEGER % {_EVAL_MOD} = 0
),
cand_sub AS (
  SELECT cand.id_a, cand.id_b FROM cand
  JOIN sub sa ON sa.clip_id = cand.id_a
  JOIN sub sb ON sb.clip_id = cand.id_b
),
truth AS (
  SELECT a.clip_id AS id_a, b.clip_id AS id_b,
         (a.bucket = b.bucket) AS same_bucket
  FROM sub a JOIN sub b ON a.clip_id < b.clip_id
  WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) + 1e-9, 2)
        >= {_EVAL_COS}
),
found AS (
  SELECT t.id_a, t.id_b FROM truth t
  JOIN cand_sub c ON c.id_a = t.id_a AND c.id_b = t.id_b
)
SELECT (SELECT count(*) FROM sub)::BIGINT AS n_clips_eval,
       (SELECT count(*) FROM truth)::BIGINT AS true_pairs,
       (SELECT count(*) FROM cand_sub)::BIGINT AS cand_pairs,
       (SELECT count(*) FROM found)::BIGINT AS found_pairs,
       (SELECT coalesce(sum(same_bucket::INT), 0) FROM truth)::BIGINT
         AS cobucket_pairs,
       CASE WHEN (SELECT count(*) FROM truth) > 0 THEN
         round((SELECT count(*) FROM found)::DOUBLE
               / (SELECT count(*) FROM truth) + 1e-9, 4) END AS pair_recall,
       CASE WHEN (SELECT count(*) FROM truth) > 0 THEN
         round((SELECT coalesce(sum(same_bucket::INT), 0) FROM truth)::DOUBLE
               / (SELECT count(*) FROM truth) + 1e-9, 4) END
         AS bucket_recall,
       CASE WHEN (SELECT count(*) FROM cand_sub) > 0 THEN
         round((SELECT count(*) FROM found)::DOUBLE
               / (SELECT count(*) FROM cand_sub) + 1e-9, 4) END AS precision
"""


# ---------------------------------------------------------------------------
# multi-table LSH (OR-amplification): the round-5 answer to the measured
# hyperplane-boundary miss. One 8-plane table groups ~54% of true ≥0.98
# pairs (bucket_recall 0.544 at sf0.01 — a pair lands in one bucket only
# if NO plane separates it); N_TABLES independent tables OR their
# candidate sets, so a pair is missed only if EVERY table splits it —
# recall 1-(1-p)^T for near-independent tables, at T× the candidate/
# ranking cost (still O(T·N·W), skew-immune per table). The plane count
# per table and the table count are the two explicit dials.
# ---------------------------------------------------------------------------

N_TABLES = 4


def _plane_t(t: int, h: int) -> list[float]:
    """Table ``t``'s hyperplane ``h`` — table 0 is the single-table
    query's plane set (so the two queries share bucket semantics);
    further tables derive from independent md5 streams."""
    if t == 0:
        return PLANES[h]
    return [
        int(hashlib.md5(f"aemb_t{t}_{h}_{i}".encode()).hexdigest()[:8], 16)
        / 2**31
        - 1.0
        for i in range(embed.EMB_DIM)
    ]


TABLE_PLANES: list[list[list[float]]] = [
    [_plane_t(t, h) for h in range(N_PLANES)] for t in range(N_TABLES)
]


def _sql_plane_t(t: int, h: int) -> str:
    return "[" + ", ".join(repr(v) for v in TABLE_PLANES[t][h]) + "]"


def _bucket_col(planes: list[list[float]]) -> F.Column:
    bucket = F.lit(0)
    for h, p in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in p])
        bucket = bucket + F.when(
            _dot(F.col("emb"), plane) > 0, 1 << h
        ).otherwise(0)
    return bucket.cast("int")


def _table_candidates(base: DataFrame, t: int) -> DataFrame:
    """Table ``t``'s sorted-neighborhood candidate pairs with their
    cosine — the exact single-table chain (bucket → per-bucket
    projection ranking → SN_W window equi-join) under table-specific
    planes. ``base`` must carry (clip_id, emb, nrm) and should be
    persisted by the caller (every table re-reads it)."""
    from pyspark.sql.window import Window

    planes = TABLE_PLANES[t]
    plane0 = F.array(*[F.lit(v) for v in planes[0]])
    b = base.select(
        "clip_id",
        "emb",
        "nrm",
        _bucket_col(planes).alias("bucket"),
        _dot(F.col("emb"), plane0).alias("proj"),
    )
    pos_w = Window.partitionBy("bucket").orderBy("proj", "clip_id")
    r = b.withColumn("pos", F.row_number().over(pos_w))
    lhs = r.select(
        F.col("clip_id").alias("l_id"),
        F.col("bucket").alias("l_bucket"),
        F.col("emb").alias("l_emb"),
        F.col("nrm").alias("l_nrm"),
        F.col("pos").alias("l_pos"),
        F.explode(F.sequence(F.lit(1), F.lit(SN_W))).alias("off"),
    ).withColumn("t_pos", F.col("l_pos") + F.col("off"))
    return lhs.join(
        r,
        (F.col("l_bucket") == F.col("bucket"))
        & (F.col("t_pos") == F.col("pos")),
    ).select(
        F.least(F.col("l_id"), F.col("clip_id")).alias("id_a"),
        F.greatest(F.col("l_id"), F.col("clip_id")).alias("id_b"),
        F.round(
            _dot(F.col("l_emb"), F.col("emb"))
            / (F.col("l_nrm") * F.col("nrm"))
            + 1e-9,
            2,
        ).alias("cos_sim"),
    )


def audio_semantic_neardup_mt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table near-dup: union the N_TABLES candidate sets, dedup
    pairs found by several tables (same pair → identical cos on every
    path, so the distinct is exact), then the production ≥0.98
    histogram. Compared against ``audio_semantic_neardup`` this trades
    T× candidate generation for the OR'd recall; the eval query
    (``audio_semantic_recall_eval_mt``) puts numbers on both sides."""
    e = embed.embed_clips(load_clips(spark, sf_dir)).filter(F.col("emb_ok"))
    base = e.select(
        "clip_id",
        "emb",
        F.sqrt(_dot(F.col("emb"), F.col("emb"))).alias("nrm"),
    ).persist(StorageLevel.DISK_ONLY)
    cand = None
    for t in range(N_TABLES):
        c = _table_candidates(base, t)
        cand = c if cand is None else cand.unionByName(c)
    return (
        cand.distinct()
        .filter(F.col("cos_sim") >= 0.98)
        .groupBy("cos_sim")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("cos_sim")
    )


def semantic_neardup_mt_oracle(sf_dir: str) -> str:
    path = features_path_for(sf_dir)
    table_ctes, table_sels = [], []
    for t in range(N_TABLES):
        terms = " + ".join(
            f"(CASE WHEN list_dot_product(emb, {_sql_plane_t(t, h)}) > 0 "
            f"THEN {1 << h} ELSE 0 END)"
            for h in range(N_PLANES)
        )
        table_ctes.append(
            f"""r{t} AS (
  SELECT clip_id, emb, nrm, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY proj, clip_id)
           AS pos
  FROM (SELECT clip_id, emb, nrm, ({terms})::INTEGER AS bucket,
               list_dot_product(emb, {_sql_plane_t(t, 0)}) AS proj
        FROM e)
),
lhs{t} AS (SELECT l.clip_id AS l_id, l.emb AS l_emb, l.nrm AS l_nrm,
                  l.bucket, l.pos + off AS t_pos
           FROM r{t} l CROSS JOIN offs),
p{t} AS (
  SELECT least(lhs{t}.l_id, r2.clip_id) AS id_a,
         greatest(lhs{t}.l_id, r2.clip_id) AS id_b,
         round(list_dot_product(lhs{t}.l_emb, r2.emb)
               / (lhs{t}.l_nrm * r2.nrm) + 1e-9, 2) AS cos_sim
  FROM lhs{t} JOIN r{t} r2
    ON r2.bucket = lhs{t}.bucket AND r2.pos = lhs{t}.t_pos
)"""
        )
        table_sels.append(f"SELECT * FROM p{t}")
    ctes = ",\n".join(table_ctes)
    union = "\nUNION ALL\n".join(table_sels)
    return f"""
WITH e AS (
  SELECT clip_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm
  FROM read_parquet('{path}/*.parquet') WHERE emb_ok
),
offs AS (SELECT unnest(generate_series(1, {SN_W})) AS off),
{ctes},
cand AS (SELECT DISTINCT id_a, id_b, cos_sim FROM ({union}))
SELECT cos_sim, count(*)::BIGINT AS n_pairs
FROM cand WHERE cos_sim >= 0.98
GROUP BY 1 ORDER BY 1
"""


def audio_semantic_recall_eval_mt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The recall eval re-run against the UNION candidate chain:
    ``bucket_recall`` becomes the fraction of true pairs co-bucketed in
    AT LEAST ONE table (the component-recall ceiling of the OR'd
    generator), ``pair_recall``/``precision`` measure the realized
    union. Read next to ``audio_semantic_recall_eval``: the delta IS
    the value of the extra tables, measured in-engine on the production
    chain."""
    e = embed.embed_clips(load_clips(spark, sf_dir))
    return recall_eval_frame_mt(e)


def recall_eval_frame_mt(e: DataFrame) -> DataFrame:
    e = e.filter(F.col("emb_ok"))
    base = e.select(
        "clip_id",
        "emb",
        F.sqrt(_dot(F.col("emb"), F.col("emb"))).alias("nrm"),
    ).persist(StorageLevel.DISK_ONLY)
    cand = None
    for t in range(N_TABLES):
        c = _table_candidates(base, t).select("id_a", "id_b")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.distinct()
    buckets = base.select(
        "clip_id",
        "emb",
        "nrm",
        *[
            _bucket_col(TABLE_PLANES[t]).alias(f"b{t}")
            for t in range(N_TABLES)
        ],
    )
    sub = buckets.filter(_eval_gate())
    ids_a = sub.select(F.col("clip_id").alias("id_a"))
    ids_b = sub.select(F.col("clip_id").alias("id_b"))
    cand_sub = cand.join(ids_a, "id_a", "left_semi").join(
        ids_b, "id_b", "left_semi"
    )
    la = sub.select(
        F.col("clip_id").alias("id_a"),
        F.col("emb").alias("ea"),
        F.col("nrm").alias("na"),
        *[F.col(f"b{t}").alias(f"ba{t}") for t in range(N_TABLES)],
    )
    lb = sub.select(
        F.col("clip_id").alias("id_b"),
        F.col("emb").alias("eb"),
        F.col("nrm").alias("nb"),
        *[F.col(f"b{t}").alias(f"bb{t}") for t in range(N_TABLES)],
    )
    cos = F.round(
        _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")) + 1e-9,
        2,
    )
    same_any = F.lit(False)
    for t in range(N_TABLES):
        same_any = same_any | (F.col(f"ba{t}") == F.col(f"bb{t}"))
    truth = (
        la.crossJoin(lb)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= _EVAL_COS)
        .select("id_a", "id_b", same_any.alias("same_bucket"))
    )
    found = truth.join(cand_sub, ["id_a", "id_b"], "left_semi")
    stats = (
        sub.agg(F.count("*").alias("n_clips_eval"))
        .crossJoin(
            truth.agg(
                F.count("*").alias("true_pairs"),
                F.coalesce(
                    F.sum(F.col("same_bucket").cast("long")), F.lit(0)
                ).alias("cobucket_pairs"),
            )
        )
        .crossJoin(cand_sub.agg(F.count("*").alias("cand_pairs")))
        .crossJoin(found.agg(F.count("*").alias("found_pairs")))
    )
    return stats.select(
        "n_clips_eval",
        "true_pairs",
        "cand_pairs",
        "found_pairs",
        "cobucket_pairs",
        F.when(
            F.col("true_pairs") > 0,
            F.round(F.col("found_pairs") / F.col("true_pairs") + 1e-9, 4),
        ).alias("pair_recall"),
        F.when(
            F.col("true_pairs") > 0,
            F.round(F.col("cobucket_pairs") / F.col("true_pairs") + 1e-9, 4),
        ).alias("bucket_recall"),
        F.when(
            F.col("cand_pairs") > 0,
            F.round(F.col("found_pairs") / F.col("cand_pairs") + 1e-9, 4),
        ).alias("precision"),
    )


def semantic_recall_eval_mt_oracle(sf_dir: str) -> str:
    path = features_path_for(sf_dir)
    table_ctes, table_sels, bcols = [], [], []
    for t in range(N_TABLES):
        terms = " + ".join(
            f"(CASE WHEN list_dot_product(emb, {_sql_plane_t(t, h)}) > 0 "
            f"THEN {1 << h} ELSE 0 END)"
            for h in range(N_PLANES)
        )
        bcols.append(f"({terms})::INTEGER AS b{t}")
        table_ctes.append(
            f"""r{t} AS (
  SELECT clip_id, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY proj, clip_id)
           AS pos
  FROM (SELECT clip_id, ({terms})::INTEGER AS bucket,
               list_dot_product(emb, {_sql_plane_t(t, 0)}) AS proj
        FROM e)
),
lhs{t} AS (SELECT l.clip_id AS l_id, l.bucket, l.pos + off AS t_pos
           FROM r{t} l CROSS JOIN offs),
p{t} AS (
  SELECT least(lhs{t}.l_id, r2.clip_id) AS id_a,
         greatest(lhs{t}.l_id, r2.clip_id) AS id_b
  FROM lhs{t} JOIN r{t} r2
    ON r2.bucket = lhs{t}.bucket AND r2.pos = lhs{t}.t_pos
)"""
        )
        table_sels.append(f"SELECT * FROM p{t}")
    ctes = ",\n".join(table_ctes)
    union = "\nUNION ALL\n".join(table_sels)
    same_any = " OR ".join(f"a.b{t} = b.b{t}" for t in range(N_TABLES))
    return f"""
WITH e AS (
  SELECT clip_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm
  FROM read_parquet('{path}/*.parquet') WHERE emb_ok
),
offs AS (SELECT unnest(generate_series(1, {SN_W})) AS off),
{ctes},
cand AS (SELECT DISTINCT id_a, id_b FROM ({union})),
sub AS (
  SELECT clip_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
         {", ".join(bcols)}
  FROM read_parquet('{path}/*.parquet')
  WHERE emb_ok AND right(clip_id, 10)::INTEGER % {_EVAL_MOD} = 0
),
cand_sub AS (
  SELECT cand.id_a, cand.id_b FROM cand
  JOIN sub sa ON sa.clip_id = cand.id_a
  JOIN sub sb ON sb.clip_id = cand.id_b
),
truth AS (
  SELECT a.clip_id AS id_a, b.clip_id AS id_b,
         ({same_any}) AS same_bucket
  FROM sub a JOIN sub b ON a.clip_id < b.clip_id
  WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) + 1e-9, 2)
        >= {_EVAL_COS}
),
found AS (
  SELECT t.id_a, t.id_b FROM truth t
  JOIN cand_sub c ON c.id_a = t.id_a AND c.id_b = t.id_b
)
SELECT (SELECT count(*) FROM sub)::BIGINT AS n_clips_eval,
       (SELECT count(*) FROM truth)::BIGINT AS true_pairs,
       (SELECT count(*) FROM cand_sub)::BIGINT AS cand_pairs,
       (SELECT count(*) FROM found)::BIGINT AS found_pairs,
       (SELECT coalesce(sum(same_bucket::INT), 0) FROM truth)::BIGINT
         AS cobucket_pairs,
       CASE WHEN (SELECT count(*) FROM truth) > 0 THEN
         round((SELECT count(*) FROM found)::DOUBLE
               / (SELECT count(*) FROM truth) + 1e-9, 4) END AS pair_recall,
       CASE WHEN (SELECT count(*) FROM truth) > 0 THEN
         round((SELECT coalesce(sum(same_bucket::INT), 0) FROM truth)::DOUBLE
               / (SELECT count(*) FROM truth) + 1e-9, 4) END
         AS bucket_recall,
       CASE WHEN (SELECT count(*) FROM cand_sub) > 0 THEN
         round((SELECT count(*) FROM found)::DOUBLE
               / (SELECT count(*) FROM cand_sub) + 1e-9, 4) END AS precision
"""


AC_K = 8  # clusters for the balance report


def audio_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling weights over the audio-embedding space —
    the data-mixing step after SemDeDup-style clustering (DataComp /
    cluster-balanced sampling): assign every clip to its nearest centroid,
    then give each cluster a temperature-flattened sampling weight
    ``sqrt(n_c) / Σ sqrt(n_c)`` so over-represented acoustic modes (one
    speaker, one room, one synthetic tone family) stop dominating the
    training mix. ``boost`` = weight / natural share — the per-cluster
    over/under-sampling multiplier a sampler applies downstream.

    Plan shape at 10^12 clips: ONE Arrow crossing (the shared embed pass,
    payload dies in the worker), assignment is a broadcast-literal map-only
    projection (zero shuffle — the `kmeans_train` pattern), the per-cluster
    aggregate is map-side combined, and the only unpartitioned window runs
    over the K aggregate rows (the `sample_token_budget` discipline).
    Centroids are the K lowest-clip_id vectors (deterministic init, exactly
    replayable in SQL); production swaps in `kmeans_train` output the same
    way. Rounding: distances 4 dp, weights 6 dp, boost 4 dp, all after the
    +1e-9 nudge — the cross-engine handoff discipline.

    Reference analog: none — this extends the A5 outcome-counter family
    into the sampling-policy domain.
    """
    e = embed.embed_clips(load_clips(spark, sf_dir)).filter(F.col("emb_ok"))
    init = [
        list(r["emb"])
        for r in e.orderBy("clip_id").limit(AC_K).select("emb").collect()
    ]
    def _d2(c: list[float]) -> F.Column:
        cl = F.array(*[F.lit(float(v)) for v in c])
        em = F.col("emb")
        return _dot(em, em) - 2.0 * _dot(em, cl) + _dot(cl, cl)

    dists = F.array(*[F.round(_d2(c) + 1e-9, 4) for c in init])
    assigned = e.withColumn("dists", dists).select(
        (F.expr("array_position(dists, array_min(dists))") - 1)
        .cast("int")
        .alias("cluster_id"),
        F.array_min("dists").alias("d2"),
    )
    agg = assigned.groupBy("cluster_id").agg(
        F.count("*").alias("n_clips"),
        F.round(F.avg("d2") + 1e-9, 4).alias("avg_d2"),
    )
    from pyspark.sql.window import Window

    w_all = Window.partitionBy()
    tot_sqrt = F.sum(F.sqrt(F.col("n_clips"))).over(w_all)
    tot_n = F.sum(F.col("n_clips")).over(w_all)
    weight = F.sqrt(F.col("n_clips")) / tot_sqrt
    share = F.col("n_clips") / tot_n
    return agg.select(
        "cluster_id",
        "n_clips",
        "avg_d2",
        F.round(weight + 1e-9, 6).alias("weight"),
        F.round(weight / share + 1e-9, 4).alias("boost"),
    )


def cluster_balance_oracle(sf_dir: str) -> str:
    path = features_path_for(sf_dir)
    return f"""
WITH e AS (
  SELECT clip_id, emb FROM read_parquet('{path}/*.parquet') WHERE emb_ok
),
c0 AS (
  SELECT row_number() OVER (ORDER BY clip_id) - 1 AS cid, emb AS ce
  FROM e ORDER BY clip_id LIMIT {AC_K}
),
a AS (
  SELECT cid AS cluster_id, d2 FROM (
    SELECT e.clip_id, c.cid,
           round(list_dot_product(e.emb, e.emb)
                 - 2*list_dot_product(e.emb, c.ce)
                 + list_dot_product(c.ce, c.ce) + 1e-9, 4) AS d2,
           row_number() OVER (
             PARTITION BY e.clip_id
             ORDER BY round(list_dot_product(e.emb, e.emb)
                            - 2*list_dot_product(e.emb, c.ce)
                            + list_dot_product(c.ce, c.ce) + 1e-9, 4) ASC,
                      c.cid ASC) AS rn
    FROM e CROSS JOIN c0 c
  ) WHERE rn = 1
),
agg AS (
  SELECT cluster_id, count(*)::BIGINT AS n_clips,
         round(avg(d2) + 1e-9, 4) AS avg_d2
  FROM a GROUP BY cluster_id
)
SELECT cluster_id, n_clips, avg_d2,
       round(sqrt(n_clips) / sum(sqrt(n_clips)) OVER () + 1e-9, 6) AS weight,
       round((sqrt(n_clips) / sum(sqrt(n_clips)) OVER ())
             / (n_clips * 1.0 / sum(n_clips) OVER ()) + 1e-9, 4) AS boost
FROM agg
"""


QUERIES = {
    "audio_embedding_stats": audio_embedding_stats,
    "audio_semantic_neardup": audio_semantic_neardup,
    "audio_semantic_recall_eval": audio_semantic_recall_eval,
    "audio_semantic_neardup_mt": audio_semantic_neardup_mt,
    "audio_semantic_recall_eval_mt": audio_semantic_recall_eval_mt,
    "audio_cluster_balance": audio_cluster_balance,
}

ORACLE: dict[str, str] = {}

ORACLE_BUILDERS = {
    "audio_embedding_stats": embedding_stats_oracle,
    "audio_semantic_neardup": semantic_neardup_oracle,
    "audio_semantic_recall_eval": semantic_recall_eval_oracle,
    "audio_semantic_neardup_mt": semantic_neardup_mt_oracle,
    "audio_semantic_recall_eval_mt": semantic_recall_eval_mt_oracle,
    "audio_cluster_balance": cluster_balance_oracle,
}
