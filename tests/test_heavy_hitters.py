"""Heavy hitters (queries/corpus.py::corpus_heavy_hitters): a planted
hitter survives a vocabulary larger than the sketch capacity with its
EXACT count; sub-threshold tokens are excluded."""

from __future__ import annotations

from wallaby2caom2_spark.queries.corpus import (
    _HH_FRAC,
    _HH_K,
    corpus_heavy_hitters,
)


def _b26(n: int) -> str:
    s = ""
    for _ in range(4):
        s += chr(97 + n % 26)
        n //= 26
    return s


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "docs")
    df.write.parquet(f"{d}/documents.parquet")
    return d


def test_hitter_survives_vocab_larger_than_sketch(spark, tmp_path):
    # vocabulary of 3 * _HH_K distinct filler tokens (each once) forces
    # Misra-Gries evictions; the planted hitter must still come out with
    # its EXACT count — the approximate stage only nominates candidates
    n_filler = 3 * _HH_K
    fillers = [f"f{_b26(i)}" for i in range(n_filler)]
    hot_count = (n_filler + 100) // _HH_FRAC * 3 + 30  # safely over N/frac
    rows = []
    chunk = 200
    for i in range(0, n_filler, chunk):
        rows.append(" ".join(fillers[i : i + chunk]))
    rows.append(" ".join(["hotword"] * hot_count))
    d = _write(spark, tmp_path, rows)
    out = {r["term"]: r for r in corpus_heavy_hitters(spark, d).collect()}
    n_total = n_filler + hot_count
    assert "hotword" in out
    assert out["hotword"]["cnt"] == hot_count
    assert out["hotword"]["share"] == round(hot_count / n_total + 1e-9, 6)
    # every reported term genuinely exceeds the threshold
    for r in out.values():
        assert r["cnt"] * _HH_FRAC > n_total


def test_subthreshold_token_excluded(spark, tmp_path):
    # 10,000 tokens; "warm" appears 9 times — under the >10 threshold
    rows = [" ".join(f"g{_b26(i * 50 + j)}" for j in range(50)) for i in range(199)]
    rows.append(" ".join(["warm"] * 9 + ["hot"] * 41))
    d = _write(spark, tmp_path, rows)
    out = {r["term"]: r["cnt"] for r in corpus_heavy_hitters(spark, d).collect()}
    assert out == {"hot": 41}


def test_empty_partitions_are_harmless(spark, tmp_path):
    # more partitions than token rows → some MG instances see zero
    # batches and must still emit a schema-clean empty frame
    d = _write(spark, tmp_path, ["hot hot hot", "cold"])
    docs = spark.read.parquet(f"{d}/documents.parquet").repartition(16)
    d2 = str(tmp_path / "docs16")
    docs.write.parquet(f"{d2}/documents.parquet")
    out = {
        r["term"]: r["cnt"] for r in corpus_heavy_hitters(spark, d2).collect()
    }
    assert out == {"hot": 3, "cold": 1}
