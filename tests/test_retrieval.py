"""BM25 retrieval (queries/retrieval.py): rare-term weighting, tf
saturation, length normalization, and rank determinism on planted docs."""

from __future__ import annotations

import pytest

from wallaby2caom2_spark.queries.retrieval import _QUERY_MOD, bm25_retrieval


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "docs")
    df.write.parquet(f"{d}/documents.parquet")
    return d


def test_rare_term_outranks_common_terms(spark, tmp_path):
    filler = "data table row scan merge join sort " * 3
    rows = [
        (0, "zephyr data table"),  # the query (0 % 41 == 0)
        (1, filler + "zephyr gale"),  # rare query term → top
        (2, filler + "data table"),  # only common terms
        (3, filler),  # background ×5 keeps df(common) high
        (4, filler),
        (5, filler),
        (6, filler),
    ]
    assert all(i % _QUERY_MOD != 0 for i, _ in rows[1:])
    out = bm25_retrieval(spark, _write(spark, tmp_path, rows)).collect()
    by_rank = {r["rank"]: r for r in out if r["query_id"] == 0}
    assert by_rank[1]["doc_id"] == 1
    assert by_rank[1]["score"] > by_rank[2]["score"]


def test_tf_saturates_and_length_normalizes(spark, tmp_path):
    rows = [
        (0, "zephyr"),  # query
        (1, "zephyr alpha bravo charlie"),  # tf=1, short
        (2, "zephyr " * 20 + "alpha bravo charlie"),  # tf=20, long
        (3, "alpha bravo charlie delta echo fox " * 4),
        (4, "alpha bravo charlie delta echo fox " * 4),
    ]
    out = bm25_retrieval(spark, _write(spark, tmp_path, rows)).collect()
    scores = {r["doc_id"]: r["score"] for r in out if r["query_id"] == 0}
    # 20x the term frequency must NOT give ~20x the score (k1 saturation);
    # with BM25's length penalty the stuffed doc gains barely anything
    assert scores[2] < 2.5 * scores[1]


def test_ranking_is_deterministic_and_bounded(spark, tmp_path):
    filler = "alpha bravo charlie delta echo "
    rows = [(0, "alpha bravo")] + [
        (i, filler * (1 + i % 3)) for i in range(1, 30) if i % _QUERY_MOD != 0
    ]
    d = _write(spark, tmp_path, rows)
    a = bm25_retrieval(spark, d).collect()
    b = bm25_retrieval(spark, d).collect()
    assert a == b
    per_q = {}
    for r in a:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert ranks == sorted(ranks)
        assert len(ranks) <= 3


def test_query_docs_never_retrieved(spark, tmp_path):
    rows = [
        (0, "alpha bravo"),
        (41, "alpha bravo"),  # also a query doc — must not appear as a hit
        (1, "alpha bravo charlie"),
        (2, "delta echo fox"),
    ]
    out = bm25_retrieval(spark, _write(spark, tmp_path, rows)).collect()
    assert all(r["doc_id"] % _QUERY_MOD != 0 for r in out)
    assert {r["query_id"] for r in out} <= {0, 41}
