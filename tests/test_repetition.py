"""Full Gopher repetition suite (queries/curation.py
text_repetition_metrics): planted docs per metric family, first-match-wins
ordering, exact top-bigram fraction on a closed-form doc, and the
short-doc containment arm."""

from __future__ import annotations

import pytest

from wallaby2caom2_spark.queries.curation import text_repetition_metrics


def _doc(doc_id: int, text: str):
    return (doc_id, text, "en", "planted", len(text))


# an 8-word phrase planted twice: its four 5-gram windows (and 6/7/8-gram
# windows) duplicate, but no bigram repeats often enough to trip top2
_PHRASE = "one1 two2 three3 four4 five5 six6 seven7 eight8"


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    filler = " ".join(f"unique{i:03d}" for i in range(40))
    docs = [
        # top2_gram: one bigram covers ~89% of the characters (and would
        # also trip every later arm — first match must win)
        _doc(1, "spam ham " * 50),
        # dup5_gram: duplicated 5..8-gram windows from the repeated phrase,
        # top2/3/4 all below their cuts
        _doc(2, f"{_PHRASE} {filler} {_PHRASE}"),
        # ok: every window unique
        _doc(3, " ".join(f"word{i:02d}" for i in range(60))),
        # ok via containment: a 1-word doc produces no windows at all
        _doc(4, "solo"),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path_factory.mktemp("repetition"))
    df.write.parquet(f"{d}/documents.parquet")
    return d


def test_planted_arms_and_first_match(spark, planted_dir):
    rows = {
        r["verdict"]: r
        for r in text_repetition_metrics(spark, planted_dir).collect()
    }
    assert set(rows) == {"top2_gram", "dup5_gram", "ok"}
    assert rows["top2_gram"]["n_docs"] == 1
    assert rows["dup5_gram"]["n_docs"] == 1
    assert rows["ok"]["n_docs"] == 2  # varied doc + the windowless 1-word doc


def test_top_bigram_fraction_closed_form(spark, planted_dir):
    rows = {
        r["verdict"]: r
        for r in text_repetition_metrics(spark, planted_dir).collect()
    }
    # doc 1: "spam ham" occurs 50×, len 8, n_chars 450 (trailing space kept)
    assert rows["top2_gram"]["avg_top2"] == round(50 * 8 / 450 + 1e-9, 4)
    # doc 2's dup5 signal clears the 0.15 cut while its top2 stays under 0.20
    assert rows["dup5_gram"]["avg_dup5"] > 0.15
    assert rows["dup5_gram"]["avg_top2"] <= 0.20
    # the ok row averages over the varied doc and the windowless doc
    assert rows["ok"]["avg_dup5"] == 0.0


def test_excess_occurrence_accounting(spark, tmp_path):
    # phrase planted THREE times → each duplicated window has count 3, so
    # excess chars double vs the twice-planted doc (count-1 scaling)
    filler = " ".join(f"pad{i:03d}" for i in range(40))
    filler2 = " ".join(f"qad{i:03d}" for i in range(40))
    twice = f"{_PHRASE} {filler} {_PHRASE}"
    thrice = f"{_PHRASE} {filler} {_PHRASE} {filler2} {_PHRASE}"
    df = spark.createDataFrame(
        [_doc(1, twice)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d2 = str(tmp_path / "twice")
    df.write.parquet(f"{d2}/documents.parquet")
    r2 = text_repetition_metrics(spark, d2).collect()[0]

    df3 = spark.createDataFrame(
        [_doc(1, thrice)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d3 = str(tmp_path / "thrice")
    df3.write.parquet(f"{d3}/documents.parquet")
    r3 = text_repetition_metrics(spark, d3).collect()[0]
    # both classify as dup5; the thrice doc's excess-char mass per character
    # is strictly larger
    assert r2["verdict"] == r3["verdict"] == "dup5_gram"
    assert r3["avg_dup5"] > r2["avg_dup5"]
