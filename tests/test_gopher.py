"""Gopher-style rule cascade (queries/curation.py text_gopher_rules):
one planted document per cascade arm, first-match-wins ordering, and the
repetition (top-bigram coverage) signal."""

from __future__ import annotations

import pytest

from wallaby2caom2_spark.queries.curation import text_gopher_rules

_STOP_PAD = "the of and that have with"  # 6 words, satisfies the stop rule


def _doc(doc_id: int, text: str, source: str = "planted"):
    return (doc_id, text, "en", source, len(text))


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    filler = "alpha bravo charlie delta echo fox golf hotel india julie " * 5
    docs = [
        # too_few_words: 10 words
        _doc(1, "just a handful of words in this tiny document here"),
        # too_many_words: > 100k words
        _doc(2, (_STOP_PAD + " " + filler) * 1800),
        # word_length_out: 60 single-letter words (mean length 1)
        _doc(3, "a " * 60),
        # symbol_heavy: '####' tokens push #-chars per word over 0.1
        _doc(4, _STOP_PAD + " " + filler[:-1] + " " + "#### " * 7),
        # low_alpha_words: 1/4 of tokens are digit-only
        _doc(5, _STOP_PAD + " " + filler[:-1] + " " + "123 " * 22),
        # missing_stopwords: 60 content words, no required stopword
        _doc(6, filler + filler[:-1]),
        # repetitive: one bigram covers most of the characters
        _doc(7, _STOP_PAD + " " + "spam ham " * 50),
        # ok: long, varied (every bigram unique), stopword-bearing
        _doc(8, _STOP_PAD + " " + " ".join(f"word{i:02d}" for i in range(55))),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path_factory.mktemp("gopher"))
    df.write.parquet(f"{d}/documents.parquet")
    return d


def test_every_cascade_arm_fires_exactly_once(spark, planted_dir):
    rows = {r["verdict"]: r for r in text_gopher_rules(spark, planted_dir).collect()}
    assert set(rows) == {
        "too_few_words",
        "too_many_words",
        "word_length_out",
        "symbol_heavy",
        "low_alpha_words",
        "missing_stopwords",
        "repetitive",
        "ok",
    }
    assert all(r["n_docs"] == 1 for r in rows.values())


def test_repetition_signal_magnitude(spark, planted_dir):
    rows = {r["verdict"]: r for r in text_gopher_rules(spark, planted_dir).collect()}
    # "spam ham" at 50 repetitions covers well over half the characters
    assert rows["repetitive"]["avg_top_bigram_frac"] > 0.5
    # the ok doc's dominant bigram stays under the 20% cut
    assert rows["ok"]["avg_top_bigram_frac"] <= 0.2


def test_first_match_wins_ordering(spark, tmp_path):
    # a doc that violates BOTH word-count and stopword rules must be
    # reported under the EARLIER rule only
    df = spark.createDataFrame(
        [_doc(1, "zig zag zog")],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "docs")
    df.write.parquet(f"{d}/documents.parquet")
    rows = text_gopher_rules(spark, d).collect()
    assert len(rows) == 1 and rows[0]["verdict"] == "too_few_words"
