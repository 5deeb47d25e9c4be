"""Behavior pins for the epoch up-sampling materialization
(queries/corpus.py sample_epoch_upsampling) and the MAD outlier screen
(queries/textstats.py quality_outlier_mad) — properties the row-hash
oracle cannot express: mixture arithmetic, cap enforcement, gate
determinism, and robustness of the MAD rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wallaby2caom2_spark.queries.corpus import (
    MAX_EPOCHS,
    sample_epoch_upsampling,
)
from wallaby2caom2_spark.queries.textstats import quality_outlier_mad

SF_DIR = "/root/testdata/sf0.001"


def test_upsampling_hits_the_temperature_targets(spark):
    rows = sample_epoch_upsampling(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # targets respect the UniMax cap
        assert r["target_epochs"] <= MAX_EPOCHS + 1e-9
        # the hash gate realizes the fractional epoch in expectation; at
        # a few hundred docs per source the binomial noise is small
        assert r["realized_epochs"] == pytest.approx(
            r["target_epochs"], abs=0.25
        )
        # copies per doc are floor(r) or floor(r)+1, never more
        assert r["max_copies"] <= int(r["target_epochs"]) + 1
        assert r["n_materialized"] >= r["n_docs"] * int(r["target_epochs"])


def test_upsampling_preserves_corpus_pass_budget(spark):
    """The mixture targets one corpus pass: total materialized rows ≈ total
    docs (the temperature redistributes, the cap only removes)."""
    rows = sample_epoch_upsampling(spark, SF_DIR).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    n_mat = sum(r["n_materialized"] for r in rows)
    assert n_mat <= n_docs * MAX_EPOCHS
    assert n_mat == pytest.approx(n_docs, rel=0.15)


def test_upsampling_is_deterministic(spark):
    a = sample_epoch_upsampling(spark, SF_DIR).collect()
    b = sample_epoch_upsampling(spark, SF_DIR).collect()
    assert a == b


def test_mad_screen_flags_planted_outlier(spark, tmp_path):
    # uniform source: every doc the same text (MAD = 0 → nothing flagged);
    # spiked source: consistent docs plus one garbage doc (flagged)
    base = "the and for are with his they this have from one had word. " * 5
    junk = "!!!???;;;###@@@"
    rows = (
        [(i, base, "en", "uniform", len(base)) for i in range(40)]
        + [(100 + i, base + "extra words here. " * (i % 5), "en", "spiked",
            len(base) + 18 * (i % 5))
           for i in range(40)]
        + [(999, junk, "en", "spiked", len(junk))]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out_dir = str(tmp_path / "docs")
    df.write.parquet(f"{out_dir}/documents.parquet")
    res = {r["source"]: r for r in quality_outlier_mad(spark, out_dir).collect()}
    assert res["uniform"]["mad"] == 0.0
    assert res["uniform"]["n_outliers"] == 0  # degenerate source flags nothing
    assert res["spiked"]["n_outliers"] == 1  # exactly the junk doc
    assert res["spiked"]["outlier_frac"] == pytest.approx(1 / 41, abs=1e-3)


def test_mad_is_robust_where_stddev_is_not(spark, tmp_path):
    """The defining property: the outlier itself must not move the screen's
    center/scale — median and MAD with 1 junk doc in 41 equal that of the
    clean 40."""
    base = "the and for are with his they this have from one had word. " * 5
    rows_clean = [
        (i, base + ("x" * (i % 3)), "en", "s", len(base) + (i % 3))
        for i in range(40)
    ]
    junk = ("?!" * 200, "en", "s", 400)
    df_clean = spark.createDataFrame(
        rows_clean, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df_all = spark.createDataFrame(
        rows_clean + [(999, *junk)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d1, d2 = str(tmp_path / "clean"), str(tmp_path / "all")
    df_clean.write.parquet(f"{d1}/documents.parquet")
    df_all.write.parquet(f"{d2}/documents.parquet")
    clean = quality_outlier_mad(spark, d1).collect()[0]
    spiked = quality_outlier_mad(spark, d2).collect()[0]
    assert spiked["med_quality"] == pytest.approx(clean["med_quality"], abs=2e-4)
    assert spiked["mad"] == pytest.approx(clean["mad"], abs=2e-4)


def test_psi_flags_a_shifted_source(spark, tmp_path):
    """Sources drawn from the corpus-typical quality distribution read
    'stable'; a source concentrated in one extreme decile reads 'shifted'
    (PSI > 0.25)."""
    from wallaby2caom2_spark.queries.textstats import quality_psi_by_source

    # two big sources with the SAME varied length profile (they define the
    # baseline), one source of uniformly tiny junk docs (mass in one bin)
    rows = []
    word = "the of and data row table scan "
    for s in ("a", "b"):
        for i in range(600):
            rows.append(
                (len(rows), word * (2 + i % 9), "en", s, len(word) * (2 + i % 9))
            )
    # junk stays a small corpus share (~4%): a global decile then absorbs
    # the junk mass together with the cleanest sources' lowest docs, so the
    # clean sources do not themselves vacate a bin (at 20% junk they
    # legitimately would — PSI measures distance from the CORPUS mix)
    for i in range(50):
        rows.append((len(rows), "zz", "en", "junk", 2))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs")
    df.write.parquet(f"{d}/documents.parquet")
    res = {r["source"]: r for r in quality_psi_by_source(spark, d).collect()}
    assert res["junk"]["drift"] == "shifted"
    assert res["a"]["drift"] == "stable"
    assert res["b"]["drift"] == "stable"
    # PSI is symmetric-ish in its inputs here: a and b mirror each other
    assert abs(res["a"]["psi"] - res["b"]["psi"]) < 0.05


def test_psi_counts_vacated_bins(spark, tmp_path):
    """The review scenario the densified source × bin grid exists for:
    when a source has ZERO documents in a bin where the baseline has
    mass, the smoothed vacated-bin term (ε − q)·ln(ε/q) must enter the
    sum — dropping it (the occupied-cells-only groupBy) understates the
    drift by an order of magnitude.

    Hand-computable construction: two sources, each concentrated on one
    of two quality levels. Each source's PSI = its occupied-bin term
    (0.5·ln 2 ≈ 0.347 — all the old code counted) + its vacated-bin term
    ((ε − 0.5)·ln(ε/0.5) ≈ 4.26). Asserting PSI > 4 fails without the
    grid (old value ≈ 0.35) and the two sources must be symmetric."""
    from wallaby2caom2_spark.queries.textstats import quality_psi_by_source

    word = "the of and data row table scan "
    rows = [(i, word * 2, "en", "x", len(word) * 2) for i in range(100)] + [
        (100 + i, word * 8, "en", "y", len(word) * 8) for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs")
    df.write.parquet(f"{d}/documents.parquet")
    res = {r["source"]: r for r in quality_psi_by_source(spark, d).collect()}
    assert res["x"]["psi"] > 4.0  # vacated-bin term present
    assert res["y"]["psi"] > 4.0
    assert res["x"]["psi"] == res["y"]["psi"]  # symmetric by construction
    assert res["x"]["drift"] == res["y"]["drift"] == "shifted"
