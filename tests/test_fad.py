"""Diagonal Fréchet Audio Distance (queries/clips_flagship.py
_fad_relation): identical groups score ~0 against the corpus, a planted
mean shift produces the closed-form distance, and the metric grows
monotonically with the shift."""

from __future__ import annotations

import pytest

from wallaby2caom2_spark.queries.clips_flagship import _fad_relation

_SCHEMA = "codec string, c0_mean double, c1_mean double, c2_mean double"


def _group(codec: str, base: float, n: int = 40, shift: float = 0.0):
    # a deterministic spread around `base` (same multiset for every group)
    return [
        (codec, base + shift + (i % 7) * 0.5, 1.0 + (i % 5) * 0.25, -2.0)
        for i in range(n)
    ]


def test_identical_groups_score_zero(spark):
    df = spark.createDataFrame(_group("pcm16", 10.0) + _group("flac", 10.0), _SCHEMA)
    rows = {r["codec"]: r for r in _fad_relation(df).collect()}
    assert rows["pcm16"]["fad_diag"] == pytest.approx(0.0, abs=1e-6)
    assert rows["flac"]["fad_diag"] == pytest.approx(0.0, abs=1e-6)


def test_planted_shift_recovers_closed_form(spark):
    shift = 6.0
    df = spark.createDataFrame(
        _group("pcm16", 10.0) + _group("drifted", 10.0, shift=shift), _SCHEMA
    )
    rows = {r["codec"]: r for r in _fad_relation(df).collect()}
    # 50/50 mixture: each group's mean sits shift/2 from the corpus mean on
    # dim 0 only, and within-group spreads are identical... but the corpus
    # variance on dim 0 gains the between-group term (shift/2)^2, so
    # fad = (shift/2)^2 + (sigma_g - sigma_corpus)^2 > (shift/2)^2
    assert rows["drifted"]["mean_shift"] == pytest.approx(shift / 2, abs=1e-6)
    assert rows["pcm16"]["mean_shift"] == pytest.approx(shift / 2, abs=1e-6)
    assert rows["drifted"]["fad_diag"] > (shift / 2) ** 2 - 1e-9


def test_fad_monotone_in_shift(spark):
    def fad_at(shift):
        df = spark.createDataFrame(
            _group("ref", 10.0, n=120) + _group("d", 10.0, n=40, shift=shift),
            _SCHEMA,
        )
        return {r["codec"]: r for r in _fad_relation(df).collect()}["d"]["fad_diag"]

    f2, f4, f8 = fad_at(2.0), fad_at(4.0), fad_at(8.0)
    assert 0 < f2 < f4 < f8
