"""Bigram LM train+score (queries/corpus.py ngram_lm_train_score): pure-
Python brute-force replay of the whole train/score path, plus structural
invariants. The oracle hash-match proves Spark == DuckDB; this proves the
shared semantics are the INTENDED ones (add-k smoothing, deterministic
split, unseen-context fallback)."""

from __future__ import annotations

import math
import re

import duckdb
import pytest

import __spark_entry__ as entry
from wallaby2caom2_spark.queries.corpus import (
    LM_K,
    LM_TRAIN_KEEP,
    LM_TRAIN_MOD,
    WORD_RE,
)

SF_DIR = "/root/testdata/sf0.001"


def _brute():
    rows = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    tok = re.compile(WORD_RE)
    pair_counts: dict[tuple[str, str], int] = {}
    ctx_counts: dict[str, int] = {}
    vocab: set[str] = set()
    eval_docs = []
    for doc_id, lang, text in rows:
        w = tok.findall(text.lower())
        train = (doc_id % LM_TRAIN_MOD) < LM_TRAIN_KEEP
        bgs = list(zip(w, w[1:]))
        if train:
            vocab.update(w)
            for bg in bgs:
                pair_counts[bg] = pair_counts.get(bg, 0) + 1
                ctx_counts[bg[0]] = ctx_counts.get(bg[0], 0) + 1
        elif bgs:
            eval_docs.append((doc_id, lang, bgs))
    V = len(vocab)
    per_lang: dict[str, list[float]] = {}
    for doc_id, lang, bgs in eval_docs:
        lps = [
            math.log(
                (pair_counts.get(bg, 0) + LM_K)
                / (ctx_counts.get(bg[0], 0) + LM_K * V)
            )
            for bg in bgs
        ]
        doc_lp = round(sum(lps) / len(lps) + 1e-9, 6)
        per_lang.setdefault(lang, []).append(doc_lp)
    return {
        lang: (len(v), round(sum(v) / len(v) + 1e-9, 4))
        for lang, v in per_lang.items()
    }


def test_matches_bruteforce_replay(spark):
    got = {
        r["lang"]: (r["n_eval_docs"], r["avg_logprob"])
        for r in entry.queries()["ngram_lm_train_score"](spark, SF_DIR).collect()
    }
    want = _brute()
    assert got == want


def test_split_is_deterministic_and_disjoint(spark):
    """Eval docs are exactly the doc_id % MOD >= KEEP slice with ≥1 bigram —
    no training doc leaks into scoring."""
    got = entry.queries()["ngram_lm_train_score"](spark, SF_DIR).collect()
    n_eval = sum(r["n_eval_docs"] for r in got)
    expect = duckdb.sql(
        f"""SELECT count(*) FROM '{SF_DIR}/documents.parquet'
        WHERE doc_id % {LM_TRAIN_MOD} >= {LM_TRAIN_KEEP}
          AND len(regexp_extract_all(lower(text), '{WORD_RE}')) >= 2"""
    ).fetchone()[0]
    assert n_eval == expect
    # held-out log-probs are genuine probabilities: strictly negative, and
    # bounded below by the worst smoothed estimate ln(k / (max_cu + kV))
    for r in got:
        assert r["avg_logprob"] < 0.0
        assert r["avg_logprob"] > -20.0


@pytest.mark.parametrize("doc_mod", [0, LM_TRAIN_KEEP])
def test_unseen_context_gets_uniform_fallback(doc_mod):
    """The add-k rule degrades an unseen context u to exactly 1/V — the
    uniform fallback the smoothing is designed to give."""
    V = 100
    p = (0 + LM_K) / (0 + LM_K * V)
    assert abs(p - 1.0 / V) < 1e-15
