"""Iterative BPE trainer (queries/corpus.py::_bpe_train) vs a pure-Python
reference implementation — pins the greedy merge semantics (most-frequent
pair, lexicographic tie-break, non-overlapping left-to-right application)
independently of the DuckDB oracle."""

from __future__ import annotations

import re
from collections import Counter

from wallaby2caom2_spark.queries import corpus


def _py_bpe(texts: list[str], k: int) -> Counter:
    """Reference BPE: same word alphabet, same greedy rules, str.replace."""
    vocab = Counter()
    for t in texts:
        for w in re.findall(corpus.WORD_RE, t.lower()):
            vocab[" " + " ".join(w) + " "] += 1
    for _ in range(k):
        pairs: Counter = Counter()
        for seq, freq in vocab.items():
            toks = seq.split()
            for a, b in zip(toks, toks[1:]):
                pairs[f"{a} {b}"] += freq
        if not pairs:
            break
        # most frequent, ties broken by pair string ascending
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merged = " " + best.replace(" ", "") + " "
        vocab = Counter(
            {
                # str.replace = non-overlapping left-to-right, the same
                # semantics as Spark/DuckDB replace()
                seq.replace(f" {best} ", merged): freq
                for seq, freq in vocab.items()
            }
        )
    toks: Counter = Counter()
    for seq, freq in vocab.items():
        for t in seq.split():
            toks[t] += freq
    return toks


def _py_word_tokens(texts: list[str], k: int) -> dict[str, int]:
    """Reference encode: replay the same k greedy merges over a
    word → (spaced seq, freq) map; a word's token count is the length of
    its final merged sequence."""
    freqs: Counter = Counter()
    for t in texts:
        freqs.update(re.findall(corpus.WORD_RE, t.lower()))
    seqs = {w: " " + " ".join(w) + " " for w in freqs}
    for _ in range(k):
        pairs: Counter = Counter()
        for w, seq in seqs.items():
            toks = seq.split()
            for a, b in zip(toks, toks[1:]):
                pairs[f"{a} {b}"] += freqs[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merged = " " + best.replace(" ", "") + " "
        seqs = {w: seq.replace(f" {best} ", merged) for w, seq in seqs.items()}
    return {w: len(seq.split()) for w, seq in seqs.items()}


TEXTS = [
    "the cat sat on the mat",
    "the bat and the cat chat",
    "that hat is the best hat",
    "rats chase the fat cat",
    "a pattern that repeats repeats repeats",
]


def test_bpe_train_matches_python_reference(spark):
    texts = TEXTS
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    out = corpus._bpe_train(docs).collect()
    ref = _py_bpe(texts, corpus.BPE_MERGES)
    expected = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[
        : corpus.BPE_TOP_TOKENS
    ]
    got = [(r["token"], r["tok_count"]) for r in out]
    assert got == expected
    assert [r["rk"] for r in out] == list(range(1, len(expected) + 1))
    # the corpus is built so merges actually fire: some learned token must
    # be multi-character, or the test proves nothing about merging
    assert any(len(t) > 1 for t, _ in expected)


def test_bpe_encode_fertility_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(TEXTS)],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in corpus._bpe_encode(docs).collect()}
    tok_map = _py_word_tokens(TEXTS, corpus.BPE_MERGES)
    assert len(out) == len(TEXTS)
    for i, t in enumerate(TEXTS):
        words = re.findall(corpus.WORD_RE, t.lower())
        n_tokens = sum(tok_map[w] for w in words)
        row = out[f"d{i}"]
        assert row["n_words"] == len(words)
        assert row["n_tokens"] == n_tokens
        assert row["fertility"] == round(n_tokens / len(words) + 1e-9, 4)
    # merges must actually compress something or fertility is trivially
    # equal to word length everywhere
    assert any(
        out[f"d{i}"]["n_tokens"]
        < sum(len(w) for w in re.findall(corpus.WORD_RE, t.lower()))
        for i, t in enumerate(TEXTS)
    )
