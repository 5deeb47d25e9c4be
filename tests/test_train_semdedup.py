"""Semantic invariants for the round-3 additions: SemDeDup-style cluster
dedup, exact-substring (Lee et al.) dedup, and iterative classifier
training. The oracle hash-match (test_queries_registry / check_oracle)
proves cross-engine equality; these tests prove the SEMANTICS — brute-force
numpy/python replays of the election and window rules, learning evidence
for the trained model, determinism across runs."""

from __future__ import annotations

import hashlib

import numpy as np

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# semantic_cluster_dedup
# ---------------------------------------------------------------------------

def _brute_semdedup():
    """Pure-numpy replay of the SemDeDup election at sf0.001."""
    import duckdb

    from wallaby2caom2_spark.queries.similarity import (
        KMEANS_K,
        SEMDEDUP_TAU,
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype=np.float64)
    cents = X[:KMEANS_K]
    # dot-expansion form, rounded like both engines
    d2 = (
        (X * X).sum(1)[:, None]
        - 2.0 * X @ cents.T
        + (cents * cents).sum(1)[None, :]
    )
    d2 = np.round(d2 + 1e-9, 4)
    cid = d2.argmin(1)  # argmin ties → lowest index, same as both engines
    cd2 = d2[np.arange(len(X)), cid]
    nrm = np.sqrt((X * X).sum(1))
    keep = {}
    for c in sorted(set(cid)):
        member_idx = np.where(cid == c)[0]
        order = sorted(member_idx, key=lambda i: (cd2[i], ids[i]))
        for pos, i in enumerate(order):
            removed = False
            for j in order[:pos]:
                cos = round(X[i] @ X[j] / (nrm[i] * nrm[j]) + 1e-9, 4)
                if cos >= SEMDEDUP_TAU:
                    removed = True
                    break
            keep[int(ids[i])] = not removed
    return cid, ids, keep


def test_semdedup_matches_bruteforce(spark):
    sdf = entry.queries()["semantic_cluster_dedup"](spark, SF_DIR)
    got = {r["vec_id"]: (r["cluster_id"], r["keep"]) for r in sdf.collect()}
    cid, ids, keep = _brute_semdedup()
    assert len(got) == len(ids)  # one row per vector, no dup/loss
    for i, vid in enumerate(ids):
        assert got[int(vid)][0] == int(cid[i]), vid
        assert got[int(vid)][1] == keep[int(vid)], vid
    # the election must actually remove something at this sf (threshold is
    # calibrated against the synthetic embeddings) and never everything
    kept = sum(1 for _, k in got.values() if k)
    assert 0 < kept < len(got)


def test_semdedup_rank1_always_kept(spark):
    """The best-ranked (closest-to-centroid, lowest-id tiebreak) vector of
    every cluster has no better-ranked neighbor, so it can never be
    removed."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    sdf = entry.queries()["semantic_cluster_dedup"](spark, SF_DIR)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("centroid_d2").asc(), F.col("vec_id").asc()
    )
    first = (
        sdf.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .collect()
    )
    assert first and all(r["keep"] for r in first)


# ---------------------------------------------------------------------------
# dedup_exact_substring
# ---------------------------------------------------------------------------

def _brute_substring():
    import duckdb

    from wallaby2caom2_spark.queries.dedup import _SUBSTR_DROP, _SUBSTR_K

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    windows = {}  # hash → count
    per_doc = {}
    for doc_id, text in rows:
        w = text.strip().split()
        hs = [
            hashlib.md5(" ".join(w[i : i + _SUBSTR_K]).encode()).hexdigest()
            for i in range(len(w) - _SUBSTR_K + 1)
        ]
        per_doc[doc_id] = hs
        for h in hs:
            windows[h] = windows.get(h, 0) + 1
    out = {}
    for doc_id, hs in per_doc.items():
        nd = sum(1 for h in hs if windows[h] > 1)
        frac = round(nd / len(hs) + 1e-9, 4) if hs else 0.0
        out[doc_id] = (len(hs), nd, frac, frac < _SUBSTR_DROP)
    return out


def test_exact_substring_matches_bruteforce(spark):
    sdf = entry.queries()["dedup_exact_substring"](spark, SF_DIR)
    got = {
        r["doc_id"]: (
            r["n_windows"],
            r["n_dup_windows"],
            r["dup_fraction"],
            r["keep"],
        )
        for r in sdf.collect()
    }
    want = _brute_substring()
    assert set(got) == set(want)
    for doc_id in want:
        assert got[doc_id] == want[doc_id], doc_id
    # the corpus contains verbatim-span dups (windows shared across docs):
    # some doc must have a nonzero dup fraction, and not all docs
    assert any(v[1] > 0 for v in got.values())
    assert any(v[1] == 0 for v in got.values())


def test_exact_substring_flags_whole_doc_clones(spark):
    """A doc whose every window is duplicated (an exact clone pair) must be
    dropped by the ≥ half-duplicated rule; `dedup_exact` agrees that clones
    exist whenever this query sees dup_fraction 1.0 docs."""
    sdf = entry.queries()["dedup_exact_substring"](spark, SF_DIR)
    rows = sdf.collect()
    full = [r for r in rows if r["dup_fraction"] >= 1.0]
    for r in full:
        assert not r["keep"]


# ---------------------------------------------------------------------------
# classifier_train_logreg
# ---------------------------------------------------------------------------

def test_train_logreg_learns_the_label(spark):
    """After TRAIN_ITERS gradient steps the positive class ('en') must have
    the strictly highest mean margin — the model moved toward the label, on
    held-in data, from an all-zero init (margin 0 for every doc)."""
    rows = entry.queries()["classifier_train_logreg"](spark, SF_DIR).collect()
    margins = {r["lang"]: r["avg_margin"] for r in rows}
    assert set(margins) > {"en"}
    others = [v for k, v in margins.items() if k != "en"]
    assert margins["en"] > max(others)
    # counts cover the whole table
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n


def test_train_logreg_deterministic(spark):
    a = entry.queries()["classifier_train_logreg"](spark, SF_DIR).collect()
    b = entry.queries()["classifier_train_logreg"](spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# embedding_diversity — the sum-vector identity vs the O(N^2) ground truth
# ---------------------------------------------------------------------------

def test_diversity_identity_matches_quadratic_bruteforce(spark):
    """||Σu||² − N over N(N−1) must equal the literal mean over all ordered
    pairs — verified per label against the O(N²) numpy computation."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT label, embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    by_label: dict[int, list] = {}
    for label, e in rows:
        by_label.setdefault(label, []).append(e)
    got = {
        r["label"]: (r["n_vectors"], r["mean_pairwise_cos"])
        for r in entry.queries()["embedding_diversity"](spark, SF_DIR).collect()
    }
    assert set(got) == set(by_label)
    for label, vecs in by_label.items():
        X = np.array(vecs, dtype=np.float64)
        U = X / np.sqrt((X * X).sum(1))[:, None]
        cos = U @ U.T
        n = len(U)
        brute = (cos.sum() - np.trace(cos)) / (n * (n - 1))
        assert got[label][0] == n
        assert abs(got[label][1] - brute) < 1e-4, label
