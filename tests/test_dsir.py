"""DSIR importance resampling (queries/textstats.py
sample_importance_dsir): target-like docs must be over-represented in the
resample, and the weight model must rank target-vocabulary docs above
off-domain docs."""

from __future__ import annotations

import pytest

from wallaby2caom2_spark.queries.textstats import (
    _DSIR_KEEP,
    sample_importance_dsir,
)

_TGT_VOCAB = "quantum flux boson lattice spinor gauge field tensor"
_OFF_VOCAB = "invoice ledger payroll audit quarterly revenue margin tax"


def _doc(doc_id: int, text: str, source: str):
    return (doc_id, text, "en", source, len(text))


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    docs = []
    did = 0
    # the target domain itself (source name fixed by _DSIR_TARGET_SOURCE)
    for i in range(30):
        docs.append(_doc(did, f"{_TGT_VOCAB} sample{i:03d} {_TGT_VOCAB}", "src0"))
        did += 1
    # target-LIKE raw docs — should dominate the resample
    for i in range(150):
        docs.append(_doc(did, f"{_TGT_VOCAB} extra{i:03d}", "srcA"))
        did += 1
    # off-domain raw docs — should be squeezed out
    for i in range(150):
        docs.append(_doc(did, f"{_OFF_VOCAB} other{i:03d}", "srcB"))
        did += 1
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path_factory.mktemp("dsir"))
    df.write.parquet(f"{d}/documents.parquet")
    return d


def test_target_like_docs_win_the_resample(spark, planted_dir):
    rows = {r["source"]: r for r in sample_importance_dsir(spark, planted_dir).collect()}
    assert set(rows) == {"src0", "srcA", "srcB"}
    # the resample is exactly _DSIR_KEEP docs
    assert sum(r["n_selected"] for r in rows.values()) == _DSIR_KEEP
    # selection rate: target-like source far above off-domain source
    rate_a = rows["srcA"]["n_selected"] / rows["srcA"]["n_docs"]
    rate_b = rows["srcB"]["n_selected"] / rows["srcB"]["n_docs"]
    assert rate_a > 0.9
    assert rate_b < 0.2
    # weight model: target-vocabulary docs carry higher mean weight
    assert rows["srcA"]["avg_weight"] > rows["srcB"]["avg_weight"]


def test_selected_weights_dominate_source_mean(spark, planted_dir):
    rows = {r["source"]: r for r in sample_importance_dsir(spark, planted_dir).collect()}
    for src, r in rows.items():
        if r["n_selected"] and r["n_selected"] < r["n_docs"]:
            # within a partially-selected source, the selected slice must
            # sit at or above the source's overall mean weight
            assert r["avg_selected_weight"] >= r["avg_weight"], src
