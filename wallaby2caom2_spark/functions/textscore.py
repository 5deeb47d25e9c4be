"""Fused langid + perplexity scorer over ONE row-major gather table.

Motivation (round-2 scaling work): the original split scorers did SIX random
cache-line touches per trigram — ``langid._LOGPROB[:, b]`` is a *column*
gather from a (5, 32768) row-major table, so each trigram pulls 5 lines
spaced 128 KB apart, plus one more line for the perplexity LM's own table.
At 32 busy cores those random lines are the pipeline's dominant DRAM
traffic (the text stage measured ~32% of all Python time, and per-core
throughput collapsed only at 32 cores — the bandwidth ceiling documented in
BENCH/BASELINE.md).

Fix: store both models in one C-contiguous ``(N_BUCKETS, 6)`` float32 table
— columns 0..4 the per-language log-probs, column 5 the pooled LM log-prob.
One gather per trigram touches ONE cache line (24 B row), and the per-batch
reduction is a single ``np.add.reduceat`` over the concatenated buckets
instead of a per-row numpy call. Measured at 32-way process concurrency on
the same batch shape: 108 us/row (split scorers) → 47 us/row (this module).

All public paths (pipeline fused stage, split stages, oracle labeler,
``predict_batch``/``perplexity_batch``) route through ``score_from_buckets``
so pipeline↔oracle agreement stays exact by construction — the same
single-implementation contract the reference keeps by dispatching the same
``get_*()`` blueprint functions from pipeline and golden tests
(``wallaby2caom2/main_app.py:126,159-198``).
"""

from __future__ import annotations

import numpy as np

from .langid import LANGS, _LOGPROB, _SOFTMAX_TEMP
from .perplexity import _LOGP

# (N_BUCKETS, 6) row-major: one 24-byte row per trigram bucket = one cache
# line per random access. Built once per python worker at import.
_TABLE: np.ndarray = np.ascontiguousarray(
    np.concatenate([_LOGPROB.T, _LOGP[:, None]], axis=1)
)

_PPL_CAP = 32.0
_PPL_EMPTY = float(np.exp(_PPL_CAP))


def score_from_buckets(
    bucket_list: list[np.ndarray | None],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(langs object array, conf float32 array, ppl float64 array) for a
    batch of precomputed trigram-bucket arrays (``langid.buckets_batch``).

    Empty/None rows: lang="und", conf=0, ppl=exp(32) — identical to the
    split scorers' contract.
    """
    n = len(bucket_list)
    langs = np.full(n, "und", dtype=object)
    confs = np.zeros(n, dtype=np.float32)
    ppls = np.full(n, _PPL_EMPTY, dtype=np.float64)

    idx = [i for i, b in enumerate(bucket_list) if b is not None and len(b)]
    if not idx:
        return langs, confs, ppls
    idx_a = np.asarray(idx, dtype=np.int64)
    lens = np.array([len(bucket_list[i]) for i in idx], dtype=np.int64)

    allb = (
        bucket_list[idx[0]]
        if len(idx) == 1
        else np.concatenate([bucket_list[i] for i in idx])
    )
    g = _TABLE[allb]  # (total_trigrams, 6) — the one random gather
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # reduceat is safe here: every segment is non-empty so `starts` is
    # strictly increasing (the empty-segment quirk can't trigger)
    sums = np.add.reduceat(g, starts, axis=0)
    means = sums / lens[:, None].astype(np.float32)  # (k, 6) float32

    ll = means[:, : len(LANGS)]
    lv = ll - ll.max(axis=1, keepdims=True)
    p = np.exp(lv * _SOFTMAX_TEMP)
    p /= p.sum(axis=1, keepdims=True)
    ks = np.argmax(p, axis=1)
    for j, i in enumerate(idx):
        langs[i] = LANGS[int(ks[j])]
    confs[idx_a] = p[np.arange(len(ks)), ks].astype(np.float32)

    nll = -means[:, len(LANGS)].astype(np.float64)
    ppls[idx_a] = np.exp(np.minimum(nll, _PPL_CAP))
    return langs, confs, ppls


def score_batch(
    texts: list[str | None],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hash once, score both models — the per-batch entry point for the
    fused pipeline stage."""
    from .langid import buckets_batch

    return score_from_buckets(buckets_batch(texts))
