"""Bloom-filter decontamination (queries/dedup.py decontaminate_bloom):
a verbatim eval leak must be flagged, disjoint-vocabulary train docs must
not, and the hit fraction must track true shingle containment."""

from __future__ import annotations

import pytest

from wallaby2caom2_spark.queries.dedup import (
    _BLOOM_FLAG_FRAC,
    decontaminate_bloom,
)
from wallaby2caom2_spark.queries.textstats import _DECON_MOD

_EVAL_TEXT = " ".join(f"evalword{i:02d}" for i in range(30))


def _doc(doc_id: int, text: str):
    return (doc_id, text, "en", "planted", len(text))


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    docs = [
        # eval doc (doc_id % _DECON_MOD == 0 is the eval split)
        _doc(0, _EVAL_TEXT),
        # leak: the eval text pasted verbatim inside a train doc
        _doc(1, "prefix words here " + _EVAL_TEXT + " suffix words there"),
        # partial leak: eval text's first half only
        _doc(2, " ".join(_EVAL_TEXT.split()[:15]) + " " + " ".join(
            f"own{i:02d}" for i in range(20))),
        # clean: fully disjoint vocabulary
        _doc(3, " ".join(f"clean{i:03d}" for i in range(40))),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path_factory.mktemp("bloom"))
    df.write.parquet(f"{d}/documents.parquet")
    return d


def test_verbatim_leak_flagged_clean_doc_silent(spark, planted_dir):
    assert 1 % _DECON_MOD != 0 and 3 % _DECON_MOD != 0  # both train-side
    rows = {r["doc_id"]: r for r in decontaminate_bloom(spark, planted_dir).collect()}
    # the verbatim leak carries all 28 eval shingles → far above the flag cut
    assert 1 in rows and rows[1]["flagged"]
    assert rows[1]["hit_frac"] > _BLOOM_FLAG_FRAC
    # the clean doc shares no shingle and (at this fill ratio) no FP triple
    assert 3 not in rows
    # the partial leak registers hits but stays under the flag fraction
    assert 2 in rows and not rows[2]["flagged"]
    assert 0.0 < rows[2]["hit_frac"] < _BLOOM_FLAG_FRAC


def test_hit_fraction_tracks_containment(spark, planted_dir):
    rows = {r["doc_id"]: r for r in decontaminate_bloom(spark, planted_dir).collect()}
    # doc 1 contains strictly more eval shingles than doc 2
    assert rows[1]["bloom_hits"] > rows[2]["bloom_hits"]
    assert rows[1]["hit_frac"] > rows[2]["hit_frac"]
