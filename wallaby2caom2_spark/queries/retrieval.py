"""Retrieval scoring over the ``documents`` table: BM25 top-k.

The retrieval half of a curation stack: dedup asks "is this the same
document", retrieval asks "which documents answer this query" — used in
practice to mine eval-adjacent training docs (soft decontamination), build
few-shot example pools, and audit what a source contributes to a topic.
Here the held-out query set is every 41st document (the same side-set
convention as ``decontaminate_ngram``'s eval split), scored against the
rest of the corpus with the Lucene-standard BM25 formula.

Scale shape: corpus term frequencies are one explode + (doc, term)
partial-agg; document frequencies re-aggregate from that tf table (never a
second corpus scan); the query side collapses to a small distinct
(query, term) set that BROADCASTS into the tf table, so the only wide ops
are term-keyed partial aggregations and the final per-query top-k window
over the scored pairs. At 10^12 docs the terms would be xxhash64-ed before
the shuffle (same plan, narrower rows) — kept as strings so the DuckDB
oracle replays byte-for-byte.

Cross-engine determinism: scores are rounded to 6 dp BEFORE ranking in
both engines (ln() may differ in the last ulp across libm builds; a
rounded sort key with a doc_id tiebreak makes the top-k order identical),
the family's rounding convention applied to ordering rather than values.

Reference analog: the reference's todo-list × rejected-list membership
joins (J3/J4, ``config/config.yml:56-60``) generalized from boolean
membership to ranked relevance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._tables import load

_BM25_K1 = 1.2
_BM25_B = 0.75
_QUERY_MOD = 41  # doc_id % MOD == 0 plays the role of the query set
_TOP_K = 3


def _toks() -> F.Column:
    # lowercased whitespace tokens — the textstats convention
    return F.split(F.trim(F.lower(F.col("text"))), r"\s+")


def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", _toks().alias("toks")
    )
    corpus = docs.filter(F.col("doc_id") % _QUERY_MOD != 0)
    queries = docs.filter(F.col("doc_id") % _QUERY_MOD == 0)

    tf = (
        corpus.select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    # corpus-level stats: N and avgdl from the doc side, df from tf — one
    # 1-row frame cross-broadcast into the scorer
    stats = tf.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = queries.select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.array_distinct("toks")).alias("term"),
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(df_t, "term")
        .join(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (_BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("part") + 1e-9, 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


_BM25_SQL = f"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
), tf AS (
  SELECT doc_id, len(toks) AS dl, t.term, count(*)::BIGINT AS tf
  FROM base, unnest(toks) AS t(term)
  WHERE doc_id % {_QUERY_MOD} != 0
  GROUP BY doc_id, dl, t.term
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl
  FROM (SELECT doc_id, any_value(dl) AS dl FROM tf GROUP BY doc_id)
), df_t AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), qterms AS (
  SELECT doc_id AS query_id, t.term
  FROM base, unnest(list_distinct(toks)) AS t(term)
  WHERE doc_id % {_QUERY_MOD} = 0
), scored AS (
  SELECT q.query_id, tf.doc_id,
         round(sum(
           ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (tf.tf * ({_BM25_K1} + 1.0))
           / (tf.tf + {_BM25_K1}
              * (1.0 - {_BM25_B} + {_BM25_B} * tf.dl / s.avgdl))
         ) + 1e-9, 6) AS score
  FROM tf
  JOIN qterms q USING (term)
  JOIN df_t d USING (term)
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
), ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, score
FROM ranked WHERE rank <= {_TOP_K}
ORDER BY query_id, rank
"""


QUERIES = {
    "bm25_retrieval": bm25_retrieval,
}

ORACLE = {
    "bm25_retrieval": _BM25_SQL,
}
