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


def audio_semantic_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similar-sounding clip pairs: embeddings → 8-hyperplane LSH bucket →
    within-bucket cosine → histogram of high-similarity pairs.

    Scale shape: candidate generation is the bucket equi-join (never
    all-pairs — 2^8 buckets confine the quadratic work), the cosine is a
    24-term JVM fold on slim rows, and the pair histogram is one
    aggregation. The LSH trade is explicit: a near-dup pair split by a
    hyperplane is missed; more planes with banding (the MinHash treatment,
    queries/dedup.py) is the recall dial.
    """
    e = embed.embed_clips(load_clips(spark, sf_dir)).filter(F.col("emb_ok"))
    bucket = F.lit(0)
    for h in range(N_PLANES):
        plane = F.array(*[F.lit(v) for v in PLANES[h]])
        bucket = bucket + F.when(_dot(F.col("emb"), plane) > 0, 1 << h).otherwise(0)
    b = e.select(
        "clip_id",
        "emb",
        bucket.cast("int").alias("bucket"),
        F.sqrt(_dot(F.col("emb"), F.col("emb"))).alias("nrm"),
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col("l.clip_id") < F.col("r.clip_id")),
    ).select(
        F.round(
            _dot(F.col("l.emb"), F.col("r.emb"))
            / (F.col("l.nrm") * F.col("r.nrm"))
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
    return f"""
WITH e AS (
  SELECT clip_id, emb, ({terms})::INTEGER AS bucket,
         sqrt(list_dot_product(emb, emb)) AS nrm
  FROM read_parquet('{path}/*.parquet') WHERE emb_ok
),
pairs AS (
  SELECT round(list_dot_product(l.emb, r.emb) / (l.nrm * r.nrm) + 1e-9, 2)
           AS cos_sim
  FROM e l JOIN e r
    ON l.bucket = r.bucket AND l.clip_id < r.clip_id
)
SELECT cos_sim, count(*)::BIGINT AS n_pairs
FROM pairs WHERE cos_sim >= 0.98
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "audio_embedding_stats": audio_embedding_stats,
    "audio_semantic_neardup": audio_semantic_neardup,
}

ORACLE: dict[str, str] = {}

ORACLE_BUILDERS = {
    "audio_embedding_stats": embedding_stats_oracle,
    "audio_semantic_neardup": semantic_neardup_oracle,
}
