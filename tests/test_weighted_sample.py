"""Weighted priority sampling (queries/textstats.py::
sample_weighted_priority): deterministic across calls, exactly K rows,
and heavier-weighted docs are over-represented in the sample."""

from __future__ import annotations

from wallaby2caom2_spark.queries.textstats import (
    _WPRI_K,
    sample_weighted_priority,
)


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "docs")
    df.write.parquet(f"{d}/documents.parquet")
    return d


def _corpus():
    # high-quality docs: varied natural-ish sentences (quality score high);
    # low-quality docs: heavy repetition / shouting (quality score low)
    good = (
        "the quiet harbour town woke slowly as fishermen checked their "
        "nets and gulls wheeled over the cold green water before dawn"
    )
    bad = "BUY BUY BUY BUY BUY BUY BUY BUY BUY BUY BUY BUY"
    return [
        (good + f" marker{chr(97 + i % 26)}") if i % 2 == 0 else bad
        for i in range(200)
    ]


def test_deterministic_and_exactly_k(spark, tmp_path):
    d = _write(spark, tmp_path, _corpus())
    a = sample_weighted_priority(spark, d).collect()
    b = sample_weighted_priority(spark, d).collect()
    assert a == b
    assert len(a) == _WPRI_K
    assert [r["rank"] for r in a] == list(range(1, _WPRI_K + 1))


def test_heavier_weights_overrepresented(spark, tmp_path):
    d = _write(spark, tmp_path, _corpus())
    out = sample_weighted_priority(spark, d).collect()
    # doc ids: even = good (quality ≈ 0.40), odd = bad (quality ≈ 0.26).
    # The population is 50/50; with a ~1.6x weight ratio the A-ES sample
    # of half the corpus tilts toward the heavy class (deterministic
    # hash uniforms → a fixed, reproducible count)
    n_good = sum(1 for r in out if r["doc_id"] % 2 == 0)
    assert n_good >= 0.56 * _WPRI_K, n_good
    # and the sample is genuinely without replacement: distinct ids
    assert len({r["doc_id"] for r in out}) == _WPRI_K
