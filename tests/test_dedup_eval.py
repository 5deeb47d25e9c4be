"""Source-matrix and LSH recall-eval queries (queries/dedup.py): planted
cross-source duplicates land in the right matrix cell; the recall eval
recovers a planted eval-subset duplicate pair with exact counts."""

from __future__ import annotations

from wallaby2caom2_spark.queries.dedup import (
    _RECALL_MOD,
    dedup_lsh_recall_eval,
    dedup_source_matrix,
)

_T1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
_T2 = "kilo lima mike november oscar papa quebec romeo sierra tango"
_T3 = "uniform victor whiskey xray yankee zulu apple banana cherry date"


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "docs")
    df.write.parquet(f"{d}/documents.parquet")
    return d


def test_source_matrix_cells(spark, tmp_path):
    rows = [
        (1, _T1, "mirror"),   # cross-source duplicate: crawl ↔ mirror
        (2, _T1, "crawl"),
        (3, _T2, "crawl"),    # within-source duplicate: crawl diagonal
        (4, _T2, "crawl"),
        (5, _T3, "clean"),    # singleton — contributes nothing
    ]
    d = _write(spark, tmp_path, rows)
    out = {
        (r["source_a"], r["source_b"]): r
        for r in dedup_source_matrix(spark, d).collect()
    }
    assert set(out) == {("crawl", "mirror"), ("crawl", "crawl")}
    assert out[("crawl", "mirror")]["n_pairs"] == 1
    assert out[("crawl", "mirror")]["avg_jaccard"] == 1.0
    assert out[("crawl", "crawl")]["n_pairs"] == 1


def test_recall_eval_counts(spark, tmp_path):
    m = _RECALL_MOD
    rows = [
        (0, _T1, "s"),        # eval subset (ids ≡ 0 mod 17)
        (m, _T1, "s"),        # its duplicate, also in subset
        (2 * m, _T2, "s"),
        (3 * m, _T3, "s"),
        (1, _T2, "s"),        # duplicates OUTSIDE the subset must not count
        (2, _T2, "s"),
    ]
    d = _write(spark, tmp_path, rows)
    r = dedup_lsh_recall_eval(spark, d).collect()[0]
    assert r["n_docs_eval"] == 4
    assert r["true_pairs"] == 1
    assert r["found_pairs"] == 1
    assert r["cand_pairs"] == 1
    assert r["recall"] == 1.0
    assert r["precision"] == 1.0


def test_recall_eval_degenerate_null(spark, tmp_path):
    m = _RECALL_MOD
    rows = [(0, _T1, "s"), (m, _T2, "s")]  # no true pairs, no candidates
    d = _write(spark, tmp_path, rows)
    r = dedup_lsh_recall_eval(spark, d).collect()[0]
    assert (r["true_pairs"], r["cand_pairs"]) == (0, 0)
    assert r["recall"] is None and r["precision"] is None
