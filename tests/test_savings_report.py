"""Dedup savings report (queries/dedup.py::dedup_savings_report): planted
duplicate families land in the right size band with exact doc/char savings;
singletons contribute nothing."""

from __future__ import annotations

from wallaby2caom2_spark.queries.dedup import dedup_savings_report


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "docs")
    df.write.parquet(f"{d}/documents.parquet")
    return d


def test_bands_and_exact_savings(spark, tmp_path):
    trip = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    pair = "kilo lima mike november oscar papa quebec romeo sierra tango"
    solo = "uniform victor whiskey xray yankee zulu one two three four"
    rows = [(1, trip), (2, trip), (3, trip), (10, pair), (11, pair), (20, solo)]
    d = _write(spark, tmp_path, rows)
    out = {r["band"]: r for r in dedup_savings_report(spark, d).collect()}
    total_chars = sum(len(t) for _, t in rows)

    assert set(out) == {"2", "3-4"}
    b2 = out["2"]
    assert (b2["n_clusters"], b2["docs_removed"]) == (1, 1)
    assert b2["chars_removed"] == len(pair)
    assert b2["pct_corpus_chars"] == round(len(pair) / total_chars + 1e-9, 6)
    b3 = out["3-4"]
    assert (b3["n_clusters"], b3["docs_removed"]) == (1, 2)
    assert b3["chars_removed"] == 2 * len(trip)


def test_no_duplicates_no_rows(spark, tmp_path):
    rows = [
        (1, "alpha bravo charlie delta echo foxtrot"),
        (2, "golf hotel india juliett kilo lima"),
    ]
    d = _write(spark, tmp_path, rows)
    assert dedup_savings_report(spark, d).count() == 0
