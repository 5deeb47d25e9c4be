"""Deduplication operators over the ``documents`` table.

Training-data-pipeline ops the 100 TB engine needs beyond the reference's
surface (reference analog: distinct-key containers A3/A6,
``wallaby2caom2/fix_product_id_visit.py:97``). All cross-engine-deterministic:
hashes are md5 (identical in Spark and DuckDB), set math is exact small-int
division, so value-hashes match bit-for-bit.

Scale notes (100 TB design):
- exact dedup: hash-groupBy on md5(text) — one shuffle on a uniform key.
- MinHash: shingles exploded once, hashed in whole-stage codegen, min'd by
  a map-side-combined groupBy (no Python, no per-element lambdas in the hot
  path); LSH banding turns the quadratic pair problem into an equi-join on
  (band, bucket) — the shuffle key is the band hash, uniform by construction.
- SimHash: per-row bit-majority over word hashes, pure codegen.
- n-gram Jaccard: exact verify step; `dedup_lsh_verified_pairs` composes the
  real scale path (LSH candidates → verify), `dedup_ngram_jaccard` keeps the
  broadcast-probe variant for targeted verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.graph import min_label_components
from ._tables import load

N_MINHASH = 8  # 4 bands x 2 rows
_SHINGLE = 3  # words per shingle


# one tokenizer and one eval-set rule for the whole corpus-query family:
# the fuzzy (containment) and exact (n-gram) decontamination queries must
# agree on both, so they are DEFINED in textstats and imported here
from .textstats import _words  # noqa: E402
from .textstats import _QUALITY_SQL as _TEXT_QUALITY_SQL  # noqa: E402
from .textstats import text_quality_score  # noqa: E402


# ---------------------------------------------------------------------------
# exact dedup — content-hash groupBy
# ---------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", F.md5(F.col("text")))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
        )
    )


_DEDUP_EXACT_SQL = """
SELECT source, count(*)::BIGINT AS n_docs,
       count(DISTINCT md5(text))::BIGINT AS n_unique
FROM documents GROUP BY source
"""


# ---------------------------------------------------------------------------
# MinHash signatures — min over md5(seed || shingle), pure codegen
# ---------------------------------------------------------------------------

def _shingles(words: F.Column) -> F.Column:
    """3-word shingles as an array column (empty when too few words)."""
    idx = F.sequence(F.lit(1), F.size(words) - (_SHINGLE - 1))
    mk = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(words, i),
            F.element_at(words, i + 1),
            F.element_at(words, i + 2),
        ),
    )
    return F.when(F.size(words) >= _SHINGLE, mk).otherwise(
        F.array().cast("array<string>")
    )


def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature (min of md5(seed||shingle) per seed).

    Shape: explode shingles once, hash in plain codegen projections, then
    ``groupBy(doc_id).min()`` — NOT per-row ``transform``/``array_min``
    lambdas. Higher-order array functions run in interpreted expression
    eval (outside whole-stage codegen) and were ~12x slower end-to-end; the
    explode form keeps all N_MINHASH md5s inside codegen, and Spark's
    partial (map-side) aggregation collapses the exchange to ~one row per
    doc, so the added shuffle moves only output-sized slim rows.
    ``explode_outer`` keeps shingle-less docs as NULL-signature rows,
    matching the oracle's list_min-over-empty semantics."""
    # the documents table is one parquet file → one scan split; the md5
    # shingle work is the dominant cost, so re-split it across cores first
    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # bind the split to a real column FIRST: _shingles indexes `words` from
    # inside a transform() lambda, and an inlined split expression would be
    # re-evaluated on every element_at — O(words²) per row, measured 20x
    # slower at 50k docs
    ex = (
        docs.withColumn("words", _words())
        .withColumn("sh", _shingles(F.col("words")))
        .select("doc_id", F.explode_outer("sh").alias("shingle"))
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{h}:"), F.col("shingle")))).alias(f"sig{h}")
        for h in range(N_MINHASH)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def _minhash_sig_sql() -> str:
    sigs = ",\n       ".join(
        "list_min(list_transform(sh, s -> md5('%d:' || s))) AS sig%d" % (h, h)
        for h in range(N_MINHASH)
    )
    return f"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(words) >= {_SHINGLE}
              THEN list_transform(generate_series(1, len(words)-{_SHINGLE - 1}),
                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
              ELSE [] END AS sh
  FROM w
)
SELECT doc_id, {sigs} FROM s
"""


# ---------------------------------------------------------------------------
# LSH banding — bucket-size accounting per band (the scale path's shuffle key)
# ---------------------------------------------------------------------------

def _band_buckets(sig: DataFrame) -> DataFrame:
    """signature rows → (doc_id, band_idx, bucket): each band hashes two
    adjacent signature rows; the bucket id is the LSH shuffle/join key.

    Shingle-less docs (NULL signature) are excluded HERE, the one choke
    point every banding consumer shares: ``concat_ws`` skips NULLs, so
    they would all hash to the single md5('') bucket per band — a
    quadratic hot key AND a divergence from the oracles' ``WHERE sig0 IS
    NOT NULL`` (confirmed: two <3-word docs produced a jaccard-1.0 pair
    on the Spark side only)."""
    bands = F.array(
        *[
            F.md5(F.concat_ws("|", F.col(f"sig{2 * b}"), F.col(f"sig{2 * b + 1}")))
            for b in range(N_MINHASH // 2)
        ]
    )
    return sig.filter(F.col("sig0").isNotNull()).select(
        "doc_id", F.posexplode(bands).alias("band_idx", "bucket")
    )


def dedup_lsh_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    exploded = _band_buckets(dedup_minhash_signature(spark, sf_dir))
    buckets = exploded.groupBy("band_idx", "bucket").agg(
        F.count("*").alias("sz")
    )
    return buckets.groupBy("band_idx").agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("sz") > 1, 1).otherwise(0)).cast("bigint").alias(
            "n_multi_buckets"
        ),
        F.sum(F.col("sz") * (F.col("sz") - 1) / 2).cast("bigint").alias(
            "n_candidate_pairs"
        ),
    )


def _bands_chain_sql() -> str:
    """Shared oracle replay of ``_band_buckets``: signature CTE + the band
    explosion with the same NULL-signature exclusion. One definition for
    every LSH-family oracle (bands / verified pairs / containment) so the
    banding rule and the sig0 filter can never drift between them — the
    same pattern as ``similarity._PQ_CHAIN_SQL`` and
    ``corpus._bpe_chain_sql``."""
    band_exprs = ", ".join(
        f"md5(sig{2 * b} || '|' || sig{2 * b + 1})" for b in range(N_MINHASH // 2)
    )
    return f"""
WITH sig AS ({_minhash_sig_sql()}),
bands AS (
  SELECT doc_id, unnest([{band_exprs}]) AS bucket,
         unnest(generate_series(0, {N_MINHASH // 2 - 1})) AS band_idx
  FROM sig WHERE sig0 IS NOT NULL
)"""


def _lsh_bands_sql() -> str:
    return _bands_chain_sql() + f""",
buckets AS (
  SELECT band_idx, bucket, count(*) AS sz FROM bands GROUP BY 1, 2
)
SELECT band_idx::INTEGER AS band_idx,
       count(*)::BIGINT AS n_buckets,
       sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END)::BIGINT AS n_multi_buckets,
       (sum(sz * (sz - 1) / 2))::BIGINT AS n_candidate_pairs
FROM buckets GROUP BY 1
"""


# ---------------------------------------------------------------------------
# full near-dup pipeline — LSH candidates → exact Jaccard verify
# ---------------------------------------------------------------------------

_VERIFY_JACCARD = 0.7


def dedup_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed at-scale dedup path: MinHash signatures → LSH banding →
    candidate pairs via EQUI-JOIN on (band_idx, bucket) (never an all-pairs
    product) → distinct pairs → exact word-set Jaccard computed ONLY for
    candidates. This is the shape that holds at 10^12 docs: both the
    bucket self-join and the two word-set lookups are hash-partitioned
    equi-joins; the quadratic work is confined to rows that already share
    a bucket, and AQE skew-join splits any hot bucket."""
    sig = dedup_minhash_signature(spark, sf_dir)
    b = _band_buckets(sig)
    cand = (
        b.select(F.col("doc_id").alias("doc_a"), "band_idx", "bucket")
        .join(
            b.select(F.col("doc_id").alias("doc_b"), "band_idx", "bucket"),
            ["band_idx", "bucket"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    w = load(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(_words()).alias("wset")
    )
    joined = cand.join(
        w.select(F.col("doc_id").alias("doc_a"), F.col("wset").alias("wa")),
        "doc_a",
    ).join(
        w.select(F.col("doc_id").alias("doc_b"), F.col("wset").alias("wb")),
        "doc_b",
    )
    common = F.size(F.array_intersect(F.col("wa"), F.col("wb")))
    jac = common / (F.size("wa") + F.size("wb") - common)
    return joined.select(
        "doc_a", "doc_b", F.round(jac + 1e-9, 4).alias("jaccard")
    ).filter(F.col("jaccard") >= _VERIFY_JACCARD)


def _lsh_verified_sql() -> str:
    return _bands_chain_sql() + f""",
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
),
w AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS wset
  FROM documents
),
j AS (
  SELECT doc_a, doc_b,
         len(list_intersect(wa.wset, wb.wset))::DOUBLE
           / (len(wa.wset) + len(wb.wset)
              - len(list_intersect(wa.wset, wb.wset))) + 1e-9 AS jr
  FROM cand
  JOIN w wa ON wa.doc_id = doc_a
  JOIN w wb ON wb.doc_id = doc_b
)
SELECT doc_a, doc_b, round(jr, 4) AS jaccard
FROM j WHERE round(jr, 4) >= {_VERIFY_JACCARD}
"""


# ---------------------------------------------------------------------------
# n-gram (word-set) Jaccard — exact verify vs a broadcast probe set
# ---------------------------------------------------------------------------

_JACCARD_MIN = 0.3


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn(
        "wset", F.array_distinct(_words())
    )
    probes = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("doc_a"), F.col("wset").alias("wa")
    )
    others = docs.select(F.col("doc_id").alias("doc_b"), F.col("wset").alias("wb"))
    joined = others.join(F.broadcast(probes), F.col("doc_b") > F.col("doc_a"))
    common = F.size(F.array_intersect(F.col("wa"), F.col("wb")))
    union = F.size("wa") + F.size("wb") - common
    jac = common / union
    return (
        joined.select(
            "doc_a", "doc_b", F.round(jac + 1e-9, 4).alias("jaccard")
        )
        .filter(F.col("jaccard") >= _JACCARD_MIN)
    )


_NGRAM_JACCARD_SQL = f"""
WITH w AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS wset
  FROM documents
),
probes AS (SELECT doc_id AS doc_a, wset AS wa FROM w WHERE doc_id % 50 = 0),
pairs AS (
  SELECT doc_a, doc_id AS doc_b,
         len(list_intersect(wa, wset))::DOUBLE
           / (len(wa) + len(wset) - len(list_intersect(wa, wset))) + 1e-9 AS j
  FROM w JOIN probes ON doc_id > doc_a
)
SELECT doc_a, doc_b, round(j, 4) AS jaccard
FROM pairs WHERE round(j, 4) >= {_JACCARD_MIN}
"""


# ---------------------------------------------------------------------------
# SimHash — 60-bit bit-majority fingerprint, nested higher-order aggregates
# ---------------------------------------------------------------------------

_SIMHASH_EXPR = """
aggregate(
  sequence(0, 59),
  cast(0 as bigint),
  (acc, j) -> acc + IF(
      aggregate(wh, 0, (a, h) -> a + IF(((shiftright(h, j)) & 1) = 1, 1, -1)) > 0,
      shiftleft(cast(1 as bigint), j),
      cast(0 as bigint))
)
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-file input → re-split the per-row hash work (see minhash note)
    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    wd = F.array_distinct(_words())
    wh = F.transform(
        wd, lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("bigint")
    )
    return (
        docs.withColumn("wh", wh)
        .select("doc_id", F.expr(_SIMHASH_EXPR).alias("simhash"))
    )


_SIMHASH_SQL = """
WITH wd AS (
  SELECT doc_id,
         unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS w
  FROM documents
),
wh AS (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM wd
),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END) AS s
  FROM wh, generate_series(0, 59) t(j)
  GROUP BY doc_id, j
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# connected components — near-dup pair graph → canonical survivor per group
# ---------------------------------------------------------------------------

_CC_MAX_ITERS = 15


def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last step of the dedup family: LSH-verified near-dup PAIRS →
    duplicate GROUPS, so each group keeps one canonical survivor
    (``component`` = min ``doc_id`` reachable through the pair graph).

    Iterative min-label propagation — the distributed-CC shape that scales:
    each round is one equi-join (edges ⋈ labels) + partial-agg min, labels
    ``localCheckpoint``-ed per round so the lineage (and thus the plan) stays
    O(1) deep instead of O(iters); on a real cluster this is
    ``spark.sparkContext.setCheckpointDir`` + ``checkpoint``. Converges in
    O(graph diameter) rounds — near-dup components are shallow (dozens of
    members), so the ``_CC_MAX_ITERS`` cap is generous; the driver-side
    convergence probe is one tiny count per round, the accepted pattern for
    iterative algorithms (not a per-row collect). Reference analog: the
    plane re-homing regroup J1 (``fix_product_id_visit.py:80-107``) —
    records re-keyed to a canonical group id."""
    pairs = dedup_lsh_verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return min_label_components(
        pairs, "doc_a", "doc_b", "doc_id", max_iters=_CC_MAX_ITERS
    )


def _cc_sql() -> str:
    # A CTE body may carry its own WITH chain, so the verified-pairs query
    # nests verbatim — the oracle provably walks the same pair graph.
    return f"""
WITH RECURSIVE p AS (
{_lsh_verified_sql()}
),
e AS (
  SELECT doc_a AS src, doc_b AS dst FROM p
  UNION ALL
  SELECT doc_b, doc_a FROM p
),
reach(src, dst) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
)
SELECT src AS doc_id, least(src, min(dst)) AS component
FROM reach GROUP BY src
"""


# ---------------------------------------------------------------------------
# PageRank over the near-dup graph — hub documents of boilerplate families
# ---------------------------------------------------------------------------

_PR_ITERS = 8
_PR_DAMP = 0.85


def dedup_pagerank_hubs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the (undirected) LSH-verified near-dup graph — the
    hub score: in a large boilerplate family the template source connects
    to many variants and accumulates rank, so the top hubs are where to
    LOOK when a dedup savings report says one family dominates.

    The third iterative-algorithm shape in the registry (k-means: fixed
    point over centroids; CC: label propagation to convergence; here:
    fixed ITERATION COUNT power method). Everything stays in-plan — the
    node count enters as a crossed-in 1-row aggregate, never a driver
    ``.count()`` — and each round is one equi-join + partial-agg sum over
    the edge list with ``localCheckpoint`` keeping the lineage O(1).

    Cross-engine determinism: rank is rounded to 12 dp EVERY iteration in
    both engines, so float-accumulation-order noise (≤ 1e-14 per round at
    near-dup degrees) can never compound across the 8 rounds; the oracle
    unrolls the same 8 steps as a CTE chain. Final handoff rounds to 6.

    Reference analog: J1's regroup generalized from "which group" to "how
    central in the group" (``fix_product_id_visit.py:80-107``).
    """
    pairs = dedup_lsh_verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.union(
        pairs.select(F.col("doc_b"), F.col("doc_a"))
    ).toDF("src", "dst")
    nodes = edges.select(F.col("src").alias("doc_id")).distinct()
    n1 = nodes.agg(F.count("*").alias("c"))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "doc_id", F.round(1.0 / F.col("c"), 12).alias("r"), "c"
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(
                ranks.select(F.col("doc_id").alias("src"), "r"), "src"
            )
            .join(deg, "src")
            .select(
                F.col("dst").alias("doc_id"),
                (F.col("r") / F.col("deg")).alias("part"),
            )
            .groupBy("doc_id")
            .agg(F.sum("part").alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n1))
            .join(contrib, "doc_id", "left")
            .select(
                "doc_id",
                F.round(
                    (1.0 - _PR_DAMP) / F.col("c")
                    + _PR_DAMP * F.coalesce(F.col("s"), F.lit(0.0)),
                    12,
                ).alias("r"),
                "c",
            )
            .localCheckpoint()
        )
    return ranks.select(
        "doc_id", F.round(F.col("r") + 1e-9, 6).alias("pagerank")
    ).orderBy(F.col("pagerank").desc(), F.col("doc_id").asc())


def _pagerank_sql() -> str:
    head = f"""
WITH p AS (
{_lsh_verified_sql()}
),
e AS (
  SELECT doc_a AS src, doc_b AS dst FROM p
  UNION ALL
  SELECT doc_b, doc_a FROM p
),
nodes AS (SELECT DISTINCT src AS doc_id FROM e),
nn AS (SELECT count(*)::BIGINT AS c FROM nodes),
deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src),
pr0 AS (SELECT doc_id, round(1.0 / c, 12) AS r FROM nodes, nn)"""
    steps = []
    for i in range(_PR_ITERS):
        steps.append(f""",
c{i} AS (
  SELECT e.dst AS doc_id, sum(pr{i}.r / deg.deg) AS s
  FROM e JOIN pr{i} ON e.src = pr{i}.doc_id
         JOIN deg ON e.src = deg.src
  GROUP BY e.dst
),
pr{i + 1} AS (
  SELECT nodes.doc_id,
         round((1.0 - {_PR_DAMP}) / c + {_PR_DAMP} * coalesce(s, 0.0), 12)
           AS r
  FROM nodes CROSS JOIN nn LEFT JOIN c{i} USING (doc_id)
)"""
        )
    return (
        head
        + "".join(steps)
        + f"""
SELECT doc_id, round(r + 1e-9, 6) AS pagerank
FROM pr{_PR_ITERS}
ORDER BY pagerank DESC, doc_id ASC
"""
    )


# ---------------------------------------------------------------------------
# LSH recall/precision evaluation — measure the banding config, don't guess
# ---------------------------------------------------------------------------

_RECALL_MOD = 17  # hash-gated eval subset; at 10^12 docs tighten the gate
                  # so the subset stays ~10^4 (the quadratic ground-truth
                  # cost is subset², an explicit dial — never corpus-wide)


def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine evaluation of the MinHash/LSH banding configuration: on a
    deterministic doc_id-gated eval subset, compute the EXACT all-pairs
    word-set-Jaccard ground truth, the banding's candidate pairs over the
    same docs, and the resulting candidate-stage recall (true pairs the
    bands surface) and precision (candidates that verify). This is the
    number that justifies N_MINHASH/band geometry — when thresholds or the
    shingle size change, the eval moves BEFORE production recall silently
    degrades.

    Scale shape: the quadratic work is confined to the gated subset (the
    cross-join is the documented intent — bounded by the gate, tuned so
    subset² stays trivial); signatures and banding reuse the production
    chain verbatim on the subset's rows, so the eval measures exactly the
    deployed config.

    Reference analog: the reference's fixture-count self-checks
    (``tests/test_composable.py:146-147``) as a continuous measurement.
    """
    sub = F.col("doc_id") % _RECALL_MOD == 0
    w = (
        load(spark, sf_dir, "documents")
        .filter(sub)
        .select("doc_id", F.array_distinct(_words()).alias("wset"))
    )
    a = w.select(F.col("doc_id").alias("doc_a"), F.col("wset").alias("wa"))
    b = w.select(F.col("doc_id").alias("doc_b"), F.col("wset").alias("wb"))
    common = F.size(F.array_intersect(F.col("wa"), F.col("wb")))
    jac = common / (F.size("wa") + F.size("wb") - common)
    truth = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", F.round(jac + 1e-9, 4).alias("jaccard")
        )
        .filter(F.col("jaccard") >= _VERIFY_JACCARD)
    )
    bands = _band_buckets(
        dedup_minhash_signature(spark, sf_dir).filter(sub)
    )
    cand = (
        bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "bucket")
        .join(
            bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "bucket"),
            ["band_idx", "bucket"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    found = truth.join(cand, ["doc_a", "doc_b"], "left_semi")
    n_docs = w.agg(F.count("*").alias("n_docs_eval"))
    stats = (
        n_docs.crossJoin(truth.agg(F.count("*").alias("true_pairs")))
        .crossJoin(cand.agg(F.count("*").alias("cand_pairs")))
        .crossJoin(found.agg(F.count("*").alias("found_pairs")))
    )
    return stats.select(
        "n_docs_eval",
        "true_pairs",
        "cand_pairs",
        "found_pairs",
        F.when(
            F.col("true_pairs") > 0,
            F.round(F.col("found_pairs") / F.col("true_pairs") + 1e-9, 4),
        ).alias("recall"),
        F.when(
            F.col("cand_pairs") > 0,
            F.round(F.col("found_pairs") / F.col("cand_pairs") + 1e-9, 4),
        ).alias("precision"),
    )


def _lsh_recall_sql() -> str:
    return f"""
WITH sig AS ({_minhash_sig_sql()}),
ssig AS (SELECT * FROM sig WHERE doc_id % {_RECALL_MOD} = 0),
bands AS (
  SELECT doc_id, unnest([{", ".join(
      f"md5(sig{2 * b} || '|' || sig{2 * b + 1})"
      for b in range(N_MINHASH // 2))}]) AS bucket,
         unnest(generate_series(0, {N_MINHASH // 2 - 1})) AS band_idx
  FROM ssig WHERE sig0 IS NOT NULL
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
),
w AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS wset
  FROM documents WHERE doc_id % {_RECALL_MOD} = 0
),
truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM w a JOIN w b ON a.doc_id < b.doc_id
  WHERE round(
    len(list_intersect(a.wset, b.wset))::DOUBLE
      / (len(a.wset) + len(b.wset) - len(list_intersect(a.wset, b.wset)))
    + 1e-9, 4) >= {_VERIFY_JACCARD}
),
found AS (SELECT * FROM truth SEMI JOIN cand USING (doc_a, doc_b)),
stats AS (
  SELECT (SELECT count(*) FROM w)::BIGINT AS n_docs_eval,
         (SELECT count(*) FROM truth)::BIGINT AS true_pairs,
         (SELECT count(*) FROM cand)::BIGINT AS cand_pairs,
         (SELECT count(*) FROM found)::BIGINT AS found_pairs
)
SELECT n_docs_eval, true_pairs, cand_pairs, found_pairs,
       CASE WHEN true_pairs > 0
            THEN round(found_pairs / true_pairs::DOUBLE + 1e-9, 4) END
         AS recall,
       CASE WHEN cand_pairs > 0
            THEN round(found_pairs / cand_pairs::DOUBLE + 1e-9, 4) END
         AS precision
FROM stats
"""


# ---------------------------------------------------------------------------
# cross-source duplication matrix — who copies from whom
# ---------------------------------------------------------------------------

def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH-verified near-dup pairs attributed to SOURCE pairs — the
    mirror-site / syndication detector: a heavy (A, B) cell with A ≠ B says
    corpus B republishes A's content (drop one side wholesale instead of
    paying per-pair dedup), a heavy diagonal says a source re-crawls
    itself. Sources are ordered lexicographically within a pair so (A, B)
    and (B, A) accumulate in one cell.

    Plan shape: the verified pairs are the pair-graph subset (tiny next to
    the corpus); two equi-joins attach the doc→source dimension — at
    10^12 docs the source map is a projection of the same documents scan,
    and the matrix itself is |sources|² at most. No work beyond the LSH
    chain touches the corpus.

    Reference analog: J3's provenance bookkeeping (rejected-by-source,
    ``config/config.yml:56-60``) lifted to pairwise source association.
    """
    pairs = dedup_lsh_verified_pairs(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    j = pairs.join(
        src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
        "doc_a",
    ).join(
        src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
        "doc_b",
    )
    return (
        j.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("jaccard") + 1e-9, 4).alias("avg_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def _source_matrix_sql() -> str:
    return f"""
WITH p AS (
{_lsh_verified_sql()}
),
j AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b,
         p.jaccard
  FROM p
  JOIN documents da ON da.doc_id = p.doc_a
  JOIN documents db ON db.doc_id = p.doc_b
)
SELECT source_a, source_b, count(*)::BIGINT AS n_pairs,
       round(avg(jaccard) + 1e-9, 4) AS avg_jaccard
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# dedup savings report — the ROI statement of the near-dup pipeline
# ---------------------------------------------------------------------------

def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What deduplication actually buys: near-dup groups (the connected
    components over LSH-verified pairs) bucketed by cluster size, with the
    documents and characters the min-id survivor election removes and the
    share of the corpus that is. The report a curation run publishes
    alongside its output — "dedup dropped X% of chars, mostly from pairs /
    mostly from one giant boilerplate family" are different stories and
    drive different next actions (tighten thresholds vs chase the source).

    Plan shape at 10^12 docs: the component labels live on the pair-graph
    subset (tiny next to the corpus) and join the documents scan by
    equi-join for their sizes; the per-component rollup and the band rollup
    are two slim aggregations, and the corpus-chars denominator is a 1-row
    aggregate crossed in — no corpus-sized shuffle beyond the CC chain
    itself.

    Reference analog: A5's outcome counters (``config/config.yml:32-36``)
    applied to the dedup stage's effect rather than per-item outcomes.
    """
    labels = dedup_connected_components(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    comp = (
        labels.join(docs, "doc_id")
        .groupBy("component")
        .agg(
            F.count("*").alias("sz"),
            F.sum("n_chars").alias("chars_all"),
            F.sum(
                F.when(F.col("doc_id") == F.col("component"), F.col("n_chars"))
            ).alias("chars_kept"),
        )
    )
    total = docs.agg(F.sum("n_chars").alias("total_chars"))
    band = (
        F.when(F.col("sz") == 2, "2")
        .when(F.col("sz") <= 4, "3-4")
        .when(F.col("sz") <= 8, "5-8")
        .otherwise("9+")
    )
    return (
        comp.withColumn("band", band)
        .groupBy("band")
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum(F.col("sz") - 1).cast("bigint").alias("docs_removed"),
            F.sum(F.col("chars_all") - F.col("chars_kept"))
            .cast("bigint")
            .alias("chars_removed"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "band",
            "n_clusters",
            "docs_removed",
            "chars_removed",
            F.round(
                F.col("chars_removed") / F.col("total_chars") + 1e-9, 6
            ).alias("pct_corpus_chars"),
        )
        .orderBy("band")
    )


def _savings_sql() -> str:
    return f"""
WITH RECURSIVE p AS (
{_lsh_verified_sql()}
),
e AS (
  SELECT doc_a AS src, doc_b AS dst FROM p
  UNION ALL
  SELECT doc_b, doc_a FROM p
),
reach(src, dst) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
),
comp_labels AS (
  SELECT src AS doc_id, least(src, min(dst)) AS component
  FROM reach GROUP BY src
),
comp AS (
  SELECT component, count(*)::BIGINT AS sz,
         sum(n_chars)::BIGINT AS chars_all,
         sum(CASE WHEN doc_id = component THEN n_chars END)::BIGINT
           AS chars_kept
  FROM comp_labels JOIN documents USING (doc_id)
  GROUP BY component
),
total AS (SELECT sum(n_chars)::BIGINT AS total_chars FROM documents)
SELECT CASE WHEN sz = 2 THEN '2' WHEN sz <= 4 THEN '3-4'
            WHEN sz <= 8 THEN '5-8' ELSE '9+' END AS band,
       count(*)::BIGINT AS n_clusters,
       sum(sz - 1)::BIGINT AS docs_removed,
       sum(chars_all - chars_kept)::BIGINT AS chars_removed,
       round(sum(chars_all - chars_kept) / total_chars::DOUBLE + 1e-9, 6)
         AS pct_corpus_chars
FROM comp, total
GROUP BY 1, total_chars ORDER BY 1
"""


# ---------------------------------------------------------------------------
# quality-keeper election — CC groups keep the BEST doc, not the lowest id
# ---------------------------------------------------------------------------

def dedup_quality_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor election by QUALITY: within each near-dup group (the
    connected components over LSH-verified pairs), keep the highest-quality
    member instead of the arbitrary min-id canonical — the election a real
    curation pipeline runs (RefinedWeb/FineWeb keep the best-scoring copy of
    boilerplate families, not the first-crawled one). Singleton docs (no
    near-dup edge) are their own component and always keep.

    Plan shape at 10^12 docs: the component labels come from the iterative
    CC (equi-joins + partial-agg min per round); the quality score is a
    map-only codegen projection over the SAME documents scan; the election
    is ONE left join (labels are the pair-graph subset — tiny next to the
    corpus, AQE broadcasts it) + ONE window partitioned by ``component``.
    Ranking uses the ROUNDED quality (4 dp, the cross-engine handoff
    discipline) with doc_id tie-break, so both engines elect identically.

    Reference analog: J1's re-key + canonical regroup
    (``fix_product_id_visit.py:80-107``) with the canonical chosen by a
    quality metric instead of key order.
    """
    labels = dedup_connected_components(spark, sf_dir)
    quality = text_quality_score(spark, sf_dir).select("doc_id", "quality")
    allq = quality.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        "quality",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return allq.withColumn("rk", F.row_number().over(w)).select(
        "doc_id",
        "component",
        "quality",
        (F.col("rk") == 1).alias("is_keeper"),
    )


def _quality_keeper_sql() -> str:
    # the CC closure and the quality query both nest verbatim as CTE bodies
    # (each may carry its own WITH chain), so the oracle provably walks the
    # same pair graph AND scores with the same formula
    return f"""
WITH RECURSIVE p AS (
{_lsh_verified_sql()}
),
e AS (
  SELECT doc_a AS src, doc_b AS dst FROM p
  UNION ALL
  SELECT doc_b, doc_a FROM p
),
reach(src, dst) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
),
comp AS (
  SELECT src AS doc_id, least(src, min(dst)) AS component
  FROM reach GROUP BY src
),
q AS (
{_TEXT_QUALITY_SQL}
),
allq AS (
  SELECT q.doc_id, COALESCE(comp.component, q.doc_id) AS component, q.quality
  FROM q LEFT JOIN comp USING (doc_id)
)
SELECT doc_id, component, quality, rk = 1 AS is_keeper
FROM (
  SELECT *, row_number() OVER (PARTITION BY component
                               ORDER BY quality DESC, doc_id ASC) AS rk
  FROM allq
)
"""


# ---------------------------------------------------------------------------
# fuzzy decontamination — shingle-set CONTAINMENT on LSH candidates
# ---------------------------------------------------------------------------

from .textstats import _DECON_MOD  # noqa: E402  (shared eval-set rule)
_CONTAINMENT_MIN = 0.3   # flag when ≥30% of an eval doc's shingles appear


def decontaminate_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY training-data decontamination: flag (train, eval) pairs where a
    large share of the EVAL document's 3-word shingles appear in the train
    document — containment |T∩E| / |E|, not Jaccard, because a short eval
    item pasted into a long train doc has tiny Jaccard but containment ≈ 1
    (the Dolma/RefinedWeb-style leak that exact n-gram hit counting
    under-ranks and symmetric near-dup misses).

    Scale shape: candidates come from the SAME MinHash→LSH banding as the
    dedup family — eval-side band buckets are a broadcast dimension (eval
    suites are thousands of docs) — and the exact shingle-set intersection
    runs ONLY on candidates. No all-pairs work anywhere; the train side
    never self-joins.
    """
    # shingle-less docs carry NULL signatures; concat_ws folds NULL to ''
    # so they would all collide in one md5('') bucket per band — the
    # quadratic hot key banding exists to avoid (and the oracle's
    # `WHERE sig0 IS NOT NULL` already excludes them)
    sig = dedup_minhash_signature(spark, sf_dir).filter(
        F.col("sig0").isNotNull()
    )
    b = _band_buckets(sig)
    is_eval = F.col("doc_id") % _DECON_MOD == 0
    cand = (
        b.filter(~is_eval)
        .select(F.col("doc_id").alias("train_doc"), "band_idx", "bucket")
        .join(
            F.broadcast(
                b.filter(is_eval).select(
                    F.col("doc_id").alias("eval_doc"), "band_idx", "bucket"
                )
            ),
            ["band_idx", "bucket"],
        )
        .select("train_doc", "eval_doc")
        .distinct()
    )
    sh = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(_shingles(_words())).alias("sset"),
    )
    joined = cand.join(
        sh.select(F.col("doc_id").alias("train_doc"), F.col("sset").alias("ts")),
        "train_doc",
    ).join(
        F.broadcast(
            sh.filter(is_eval).select(
                F.col("doc_id").alias("eval_doc"), F.col("sset").alias("es")
            )
        ),
        "eval_doc",
    )
    containment = F.size(F.array_intersect("ts", "es")) / F.size("es")
    return joined.filter(F.size("es") > 0).select(
        "train_doc",
        "eval_doc",
        F.round(containment + 1e-9, 4).alias("containment"),
    ).filter(F.col("containment") >= _CONTAINMENT_MIN)


def _containment_sql() -> str:
    return _bands_chain_sql() + f""",
cand AS (
  SELECT DISTINCT t.doc_id AS train_doc, e.doc_id AS eval_doc
  FROM bands t
  JOIN bands e ON t.band_idx = e.band_idx AND t.bucket = e.bucket
  WHERE t.doc_id % {_DECON_MOD} <> 0 AND e.doc_id % {_DECON_MOD} = 0
),
w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(words) >= {_SHINGLE}
              THEN list_distinct(list_transform(
                     generate_series(1, len(words)-{_SHINGLE - 1}),
                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
              ELSE [] END AS sset
  FROM w
),
c AS (
  SELECT train_doc, eval_doc,
         round(len(list_intersect(ts.sset, es.sset))::DOUBLE
               / len(es.sset) + 1e-9, 4) AS containment
  FROM cand
  JOIN sh ts ON ts.doc_id = train_doc
  JOIN sh es ON es.doc_id = eval_doc
  WHERE len(es.sset) > 0
)
SELECT train_doc, eval_doc, containment
FROM c WHERE containment >= {_CONTAINMENT_MIN}
"""


# ---------------------------------------------------------------------------
# exact-substring dedup — sliding K-token window hashing (Lee et al. 2022)
# ---------------------------------------------------------------------------

_SUBSTR_K = 8       # tokens per window (the paper uses 50 BPE tokens; the
                    # synthetic docs are 10-99 words, so 8 keeps every doc
                    # in-domain — the operator shape is length-independent)
_SUBSTR_DROP = 0.5  # drop a doc when ≥ half its windows are duplicated


def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring deduplication in the shape of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): every K-token sliding window is content-hashed; a
    window whose hash occurs more than once ANYWHERE in the corpus (another
    doc or another offset of the same doc) is a duplicated span; docs are
    scored by their duplicated-window fraction. The suffix-array machinery
    of the paper is a single-node construct — the distributed re-expression
    is windows → hash → groupBy(count) → join back, which is how a Spark
    engine finds repeated substrings at 10^12 docs:

    - window generation is a per-row ``transform`` over an offset
      ``sequence`` + one ``explode`` (whole-stage codegen feeds the
      generator; no Python);
    - the only data-sized shuffles are the groupBy on the window hash
      (md5 → uniform key, map-side-combined counts) and the join back on
      the same key (AQE broadcasts the duplicated-hash side when small —
      at real scale it stays a co-hashed equi-join on the SAME key, so the
      exchange is reused), then one groupBy(doc_id);
    - complements the family: `dedup_exact` catches whole-doc clones,
      MinHash/LSH catches near-dups, this catches *verbatim spans inside
      otherwise-distinct docs* (boilerplate, quoted chains, licenses).

    Docs shorter than K tokens have no windows and are kept with
    dup_fraction 0.0 (left join + coalesce), preserving one-row-per-doc.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", _words().alias("w")
    )
    n = F.size("w")
    win = (
        docs.filter(n >= _SUBSTR_K)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n - _SUBSTR_K),
                    lambda i: F.md5(
                        F.concat_ws(" ", F.slice(F.col("w"), i + 1, _SUBSTR_K))
                    ),
                )
            ).alias("h"),
        )
    )
    counts = win.groupBy("h").agg(F.count("*").alias("c"))
    per_doc = (
        win.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum((F.col("c") > 1).cast("bigint")).alias("n_dup_windows"),
        )
    )
    dup_frac = F.coalesce(
        F.round(
            F.col("n_dup_windows") / F.col("n_windows") + 1e-9, 4
        ),
        F.lit(0.0),
    )
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            dup_frac.alias("dup_fraction"),
            (dup_frac < _SUBSTR_DROP).alias("keep"),
        )
    )


_EXACT_SUBSTR_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
),
win AS (
  SELECT doc_id, md5(array_to_string(w[i : i + {_SUBSTR_K} - 1], ' ')) AS h
  FROM d, UNNEST(generate_series(1, len(w) - {_SUBSTR_K} + 1)) AS t(i)
  WHERE len(w) >= {_SUBSTR_K}
),
counts AS (SELECT h, count(*) AS c FROM win GROUP BY h),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_windows,
         sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_windows
  FROM win JOIN counts USING (h) GROUP BY doc_id
)
SELECT d2.doc_id,
       COALESCE(n_windows, 0) AS n_windows,
       COALESCE(n_dup_windows, 0) AS n_dup_windows,
       COALESCE(round(n_dup_windows * 1.0 / n_windows + 1e-9, 4), 0.0)
         AS dup_fraction,
       COALESCE(round(n_dup_windows * 1.0 / n_windows + 1e-9, 4), 0.0)
         < {_SUBSTR_DROP} AS keep
FROM (SELECT doc_id FROM documents) d2 LEFT JOIN per_doc USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Bloom-filter decontamination — O(1)-memory probe instead of a shingle join
# ---------------------------------------------------------------------------

# m = 2^15 bits in 1024 32-bit lanes (BIGINT-valued so Spark and DuckDB
# agree on 1<<31 without int32 wraparound), k = 3 independent hashes from
# disjoint md5 slices. At the gate's eval-shingle count (~2k distinct) the
# fill ratio stays ~15%, putting the per-shingle false-positive rate near
# (1-e^{-kn/m})^k ≈ 0.4% — the doc-level flag needs a large HIT FRACTION,
# which planted-clean docs cannot reach through scattered FPs.
_BLOOM_BITS = 1 << 15
_BLOOM_LANE = 32
_BLOOM_K = 3
_BLOOM_FLAG_FRAC = 0.5


def _bloom_positions(j: int) -> F.Column:
    """Bit position for hash j: disjoint 8-hex-char md5 slices → % m."""
    return (
        F.expr(f"conv(substring(md5(gram), {1 + 8 * j}, 8), 16, 10)")
        .cast("bigint")
        % _BLOOM_BITS
    )


def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter eval-set decontamination: the eval split's 3-word
    shingles are folded into a 2^15-bit Bloom filter (k = 3 md5-slice
    hashes), and every TRAIN doc's shingles probe it; docs whose hit
    fraction clears ``_BLOOM_FLAG_FRAC`` are flagged as likely leaks.

    Why a Bloom filter when ``decontaminate_ngram`` already does the exact
    join: at 10^12 train docs the exact form shuffles the train-side
    shingle stream against the eval shingles, while the Bloom form reduces
    the ENTIRE eval side to a ≤1024-row bitset that broadcasts to every
    executor — the train side is probed at scan speed with no
    decontamination-induced exchange of train data at all (the two
    doc-level aggs partial-combine map-side). The price is a quantified
    false-positive rate (header note) and no eval-doc attribution; the
    production recipe runs THIS as the cheap first pass and the exact
    containment join only on the flagged survivors.

    The whole filter lives in the plan: build is a 1024-row ``bit_or``
    aggregation, probe is a broadcast equi-join on lane index — no driver
    round-trip, no UDF. DuckDB replays the identical lane/mask arithmetic.
    """
    docs = load(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % _DECON_MOD == 0
    sh = docs.select(
        "doc_id",
        is_eval.alias("is_eval"),
        F.explode(F.array_distinct(_shingles(_words()))).alias("gram"),
    )
    triple = F.explode(
        F.array(*[_bloom_positions(j).alias(f"h{j}") for j in range(_BLOOM_K)])
    ).alias("pos")
    bitset = (
        sh.filter("is_eval")
        .select(triple)
        .select(
            (F.col("pos") / _BLOOM_LANE).cast("bigint").alias("lane"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(pos % {_BLOOM_LANE} as int))").alias(
                "mask"
            ),
        )
        .groupBy("lane")
        .agg(F.bit_or("mask").alias("bits"))
    )
    probes = (
        sh.filter(~F.col("is_eval"))
        .select("doc_id", "gram", triple)
        .select(
            "doc_id",
            "gram",
            (F.col("pos") / _BLOOM_LANE).cast("bigint").alias("lane"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(pos % {_BLOOM_LANE} as int))").alias(
                "mask"
            ),
        )
        .join(F.broadcast(bitset), "lane", "left")
        .withColumn(
            "set",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
                == F.col("mask")
            ).cast("long"),
        )
    )
    per_doc = (
        probes.groupBy("doc_id", "gram")
        .agg(F.sum("set").alias("nset"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("nset") == _BLOOM_K).cast("long")).alias("bloom_hits"),
        )
    )
    frac = F.round(F.col("bloom_hits") / F.col("n_shingles") + 1e-9, 4)
    return (
        per_doc.withColumn("hit_frac", frac)
        .withColumn("flagged", F.col("hit_frac") >= _BLOOM_FLAG_FRAC)
        .filter(F.col("bloom_hits") > 0)
        .orderBy("doc_id")
    )


def _bloom_sql() -> str:
    pos = ", ".join(
        f"('0x' || substr(md5(gram), {1 + 8 * j}, 8))::BIGINT % {_BLOOM_BITS}"
        for j in range(_BLOOM_K)
    )
    return f"""
WITH w AS (
  SELECT doc_id, doc_id % {_DECON_MOD} = 0 AS is_eval,
         string_split_regex(trim(text), '\\s+') AS words
  FROM documents
), sh AS (
  SELECT doc_id, is_eval,
         unnest(CASE WHEN len(words) >= {_SHINGLE}
              THEN list_distinct(list_transform(
                     generate_series(1, len(words)-{_SHINGLE - 1}),
                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
              ELSE [] END) AS gram
  FROM w
), positions AS (
  SELECT doc_id, is_eval, gram, unnest([{pos}]) AS pos
  FROM sh
), bitset AS (
  SELECT pos // {_BLOOM_LANE} AS lane,
         bit_or(1::BIGINT << (pos % {_BLOOM_LANE})::INT) AS bits
  FROM positions WHERE is_eval GROUP BY 1
), probes AS (
  SELECT doc_id, gram,
         CASE WHEN coalesce(bits, 0) & (1::BIGINT << (pos % {_BLOOM_LANE})::INT)
                   = (1::BIGINT << (pos % {_BLOOM_LANE})::INT)
              THEN 1 ELSE 0 END AS hit
  FROM positions LEFT JOIN bitset ON pos // {_BLOOM_LANE} = lane
  WHERE NOT is_eval
), per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_shingles,
         sum(CASE WHEN nset = {_BLOOM_K} THEN 1 ELSE 0 END)::BIGINT
           AS bloom_hits
  FROM (
    SELECT doc_id, gram, sum(hit) AS nset FROM probes GROUP BY doc_id, gram
  ) GROUP BY doc_id
)
SELECT doc_id, n_shingles, bloom_hits,
       round(bloom_hits / n_shingles::DOUBLE + 1e-9, 4) AS hit_frac,
       round(bloom_hits / n_shingles::DOUBLE + 1e-9, 4)
         >= {_BLOOM_FLAG_FRAC} AS flagged
FROM per_doc WHERE bloom_hits > 0 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# LSH candidates → character-level edit-distance verify
# ---------------------------------------------------------------------------

_LEV_CAP = 1000  # chars compared per side — bounds the O(len²) DP per pair
_LEV_SIM_MIN = 0.6


def dedup_levenshtein_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs verified by CHARACTER-level edit distance —
    the complement of ``dedup_lsh_verified_pairs``'s word-set Jaccard:
    Jaccard is blind to word order and within-word edits (OCR noise,
    diacritics stripping, token-boundary corruption), edit similarity
    catches exactly those, so the two verifiers disagree on real corpora
    and curation stacks run both.

    Scale shape: candidates come from the shared MinHash/LSH banding
    equi-join (never all-pairs); the O(len²) Levenshtein DP runs entirely
    in the JVM (``F.levenshtein`` — no Python crossing) and is bounded per
    pair by capping both sides at ``_LEV_CAP`` chars, so per-candidate cost
    is a constant at any corpus size. Similarity is rounded BEFORE the
    threshold in both engines (the family's rounding convention).

    Reference analog: the exact-equality membership checks of J3/J4
    (``config/config.yml:56-60``) relaxed to bounded edit distance.
    """
    sig = dedup_minhash_signature(spark, sf_dir)
    b = _band_buckets(sig)
    cand = (
        b.select(F.col("doc_id").alias("doc_a"), "band_idx", "bucket")
        .join(
            b.select(F.col("doc_id").alias("doc_b"), "band_idx", "bucket"),
            ["band_idx", "bucket"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    t = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring(F.trim(F.col("text")), 1, _LEV_CAP).alias("t")
    )
    joined = cand.join(
        t.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta")),
        "doc_a",
    ).join(
        t.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb")),
        "doc_b",
    )
    dist = F.levenshtein("ta", "tb")
    sim = 1.0 - dist / F.greatest(F.length("ta"), F.length("tb"))
    return joined.select(
        "doc_a",
        "doc_b",
        dist.cast("bigint").alias("edit_dist"),
        F.round(sim + 1e-9, 4).alias("edit_sim"),
    ).filter(F.col("edit_sim") >= _LEV_SIM_MIN)


def _lev_verify_sql() -> str:
    return _bands_chain_sql() + f""",
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
),
t AS (
  SELECT doc_id, substr(trim(text), 1, {_LEV_CAP}) AS t FROM documents
),
j AS (
  SELECT doc_a, doc_b,
         levenshtein(ta.t, tb.t)::BIGINT AS edit_dist,
         greatest(len(ta.t), len(tb.t)) AS ml
  FROM cand
  JOIN t ta ON ta.doc_id = doc_a
  JOIN t tb ON tb.doc_id = doc_b
)
SELECT doc_a, doc_b, edit_dist,
       round(1.0 - edit_dist / ml::DOUBLE + 1e-9, 4) AS edit_sim
FROM j WHERE round(1.0 - edit_dist / ml::DOUBLE + 1e-9, 4) >= {_LEV_SIM_MIN}
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_exact_substring": dedup_exact_substring,
    "decontaminate_containment": decontaminate_containment,
    "decontaminate_bloom": decontaminate_bloom,
    "dedup_minhash_signature": dedup_minhash_signature,
    "dedup_lsh_bands": dedup_lsh_bands,
    "dedup_lsh_verified_pairs": dedup_lsh_verified_pairs,
    "dedup_levenshtein_verify": dedup_levenshtein_verify,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_simhash": dedup_simhash,
    "dedup_connected_components": dedup_connected_components,
    "dedup_quality_keeper": dedup_quality_keeper,
    "dedup_savings_report": dedup_savings_report,
    "dedup_source_matrix": dedup_source_matrix,
    "dedup_lsh_recall_eval": dedup_lsh_recall_eval,
    "dedup_pagerank_hubs": dedup_pagerank_hubs,
}

ORACLE = {
    "dedup_exact": _DEDUP_EXACT_SQL,
    "dedup_exact_substring": _EXACT_SUBSTR_SQL,
    "decontaminate_containment": _containment_sql(),
    "decontaminate_bloom": _bloom_sql(),
    "dedup_minhash_signature": _minhash_sig_sql(),
    "dedup_lsh_bands": _lsh_bands_sql(),
    "dedup_lsh_verified_pairs": _lsh_verified_sql(),
    "dedup_levenshtein_verify": _lev_verify_sql(),
    "dedup_ngram_jaccard": _NGRAM_JACCARD_SQL,
    "dedup_simhash": _SIMHASH_SQL,
    "dedup_connected_components": _cc_sql(),
    "dedup_quality_keeper": _quality_keeper_sql(),
    "dedup_savings_report": _savings_sql(),
    "dedup_source_matrix": _source_matrix_sql(),
    "dedup_lsh_recall_eval": _lsh_recall_sql(),
    "dedup_pagerank_hubs": _pagerank_sql(),
}
