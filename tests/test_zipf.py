"""Zipf-law fit (queries/corpus.py::corpus_zipf_fit): a planted power-law
source reads zipf_like, a uniform (templated) source reads anomalous, and
a tiny source reads insufficient_data."""

from __future__ import annotations

from wallaby2caom2_spark.queries.corpus import (
    _ZIPF_MIN_RANKS,
    _ZIPF_TOP,
    corpus_zipf_fit,
)


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "docs")
    df.write.parquet(f"{d}/documents.parquet")
    return d


def _zipf_text(n_types: int, scale: int) -> str:
    # token i (1-based) appears scale//i times — exponent exactly -1
    words = []
    for i in range(1, n_types + 1):
        words.extend([f"tok{chr(97 + i // 26)}{chr(97 + i % 26)}"] * (scale // i))
    return " ".join(words)


def test_verdicts_on_planted_distributions(spark, tmp_path):
    zipf = _zipf_text(60, 600)
    uniform = (
        " ".join(f"u{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(40))
        + " "
    ) * 10
    tiny = "alpha bravo charlie"
    d = _write(
        spark,
        tmp_path,
        [("natural", zipf), ("template", uniform), ("sparse", tiny)],
    )
    out = {r["source"]: r for r in corpus_zipf_fit(spark, d).collect()}
    nat = out["natural"]
    assert nat["verdict"] == "zipf_like"
    assert -1.4 <= nat["zipf_slope"] <= -0.6
    assert nat["zipf_r2"] >= 0.8
    # uniform head: slope 0 (flat), both engines report r2=1.0 on the
    # zero-variance-y degenerate fit — the slope band still rejects it
    tpl = out["template"]
    assert tpl["verdict"] == "anomalous"
    assert abs(tpl["zipf_slope"]) < 0.05
    sp = out["sparse"]
    assert sp["verdict"] == "insufficient_data"
    assert sp["n_ranks"] < _ZIPF_MIN_RANKS


def test_head_cap_bounds_fit_rows(spark, tmp_path):
    d = _write(spark, tmp_path, [("big", _zipf_text(150, 1500))])
    out = corpus_zipf_fit(spark, d).collect()
    assert len(out) == 1
    assert out[0]["n_ranks"] == _ZIPF_TOP
