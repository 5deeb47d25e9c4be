"""Edit-distance LSH verify (queries/dedup.py::dedup_levenshtein_verify):
distance agrees with a serial DP reference, the cap bounds per-pair cost,
and the verifier catches word-order/in-word edits Jaccard is blind to."""

from __future__ import annotations

from wallaby2caom2_spark.queries.dedup import (
    _LEV_CAP,
    _LEV_SIM_MIN,
    dedup_levenshtein_verify,
    dedup_lsh_verified_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "docs")
    df.write.parquet(f"{d}/documents.parquet")
    return d


_BASE = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "falls gently on the quiet village roofs at dusk tonight"
)


def test_distance_matches_serial_reference(spark, tmp_path):
    typo = _BASE.replace("village", "villoge")
    rows = [(1, _BASE), (2, _BASE), (3, typo)]
    d = _write(spark, tmp_path, rows)
    out = {
        (r["doc_a"], r["doc_b"]): (r["edit_dist"], r["edit_sim"])
        for r in dedup_levenshtein_verify(spark, d).collect()
    }
    assert out[(1, 2)] == (0, 1.0)
    want = _lev(_BASE, typo)
    assert out[(1, 3)][0] == want == 1
    expect_sim = round(1.0 - want / max(len(_BASE), len(typo)) + 1e-9, 4)
    assert out[(1, 3)][1] == expect_sim


def test_cap_bounds_comparison_window(spark, tmp_path):
    # identical in the first _LEV_CAP chars, wildly different after — the
    # bounded-cost contract: the pair reads as exact within the window
    head = (_BASE + " ") * (_LEV_CAP // (len(_BASE) + 1) + 1)
    a = head + " alpha " * 50
    b = head + " zulu " * 80
    assert len(head) > _LEV_CAP
    d = _write(spark, tmp_path, [(1, a), (2, b)])
    out = dedup_levenshtein_verify(spark, d).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert pairs[(1, 2)]["edit_dist"] == 0
    assert pairs[(1, 2)]["edit_sim"] == 1.0


def test_catches_word_order_divergence_jaccard_misses(spark, tmp_path):
    # same word SET (Jaccard verify = 1.0) but heavily reordered — edit
    # similarity must fall below the threshold while Jaccard stays at 1.0
    words = _BASE.split()
    reordered = " ".join(reversed(words))
    d = _write(spark, tmp_path, [(1, _BASE), (2, _BASE), (3, reordered)])
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_lsh_verified_pairs(spark, d).collect()
    }
    lev = {
        (r["doc_a"], r["doc_b"]): r["edit_sim"]
        for r in dedup_levenshtein_verify(spark, d).collect()
    }
    assert lev[(1, 2)] == 1.0
    if (1, 3) in jac:  # candidate generation is shared; verify disagrees
        assert jac[(1, 3)] == 1.0
        assert (1, 3) not in lev
        assert round(1.0 - _lev(_BASE, reordered) / len(_BASE), 4) < _LEV_SIM_MIN
