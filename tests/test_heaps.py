"""Heaps-law fit (queries/corpus.py::corpus_heaps_fit): repeated boilerplate
saturates, unique-token streams grow linearly, mixed text sits between, and
tiny sources read insufficient."""

from __future__ import annotations

from wallaby2caom2_spark.queries.corpus import (
    _HEAPS_BETA_SAT,
    _HEAPS_BETA_UNB,
    corpus_heaps_fit,
)


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "docs")
    df.write.parquet(f"{d}/documents.parquet")
    return d


def _b26(n: int) -> str:
    # letter-only suffix — the corpus tokenizer is [a-z]+ runs, so digit
    # suffixes would collapse every "unique" token to its stem
    s = ""
    for _ in range(3):
        s += chr(97 + n % 26)
        n //= 26
    return s


def test_verdicts_on_planted_growth_curves(spark, tmp_path):
    rows = []
    # template: the same sentence 50 times → no new types with more docs
    boiler = (
        "please accept our terms and conditions before you continue today "
        "right now"
    )
    rows += [("template", boiler) for _ in range(50)]
    # random: every doc is 12 never-seen tokens → V grows ~linearly with N
    for i in range(50):
        rows.append(
            (
                "random",
                " ".join(f"uid{_b26(i)}x{_b26(j)}" for j in range(12)),
            )
        )
    # mixed: a shared core plus a couple of fresh types per doc
    core = "the quick brown fox jumps over the lazy dog again and again"
    for i in range(50):
        rows.append(
            ("mixed", core + f" novelty{_b26(i)} extra{_b26(i)}")
        )
    rows += [("tiny", "alpha bravo charlie")]
    d = _write(spark, tmp_path, rows)
    out = {r["source"]: r for r in corpus_heaps_fit(spark, d).collect()}

    assert out["template"]["verdict"] == "saturated"
    assert out["template"]["heaps_beta"] <= _HEAPS_BETA_SAT
    assert out["random"]["verdict"] == "unbounded"
    assert out["random"]["heaps_beta"] >= _HEAPS_BETA_UNB
    assert out["mixed"]["verdict"] == "heaps_like"
    assert (
        _HEAPS_BETA_SAT
        < out["mixed"]["heaps_beta"]
        < _HEAPS_BETA_UNB
    )
    assert out["tiny"]["verdict"] == "insufficient_data"
    # full-corpus point sanity: ttr = v_types / n_tokens
    r = out["random"]
    assert r["ttr"] == round(r["v_types"] / r["n_tokens"] + 1e-9, 6)
