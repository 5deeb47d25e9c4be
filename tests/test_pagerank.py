"""PageRank hubs (queries/dedup.py::dedup_pagerank_hubs): values match a
serial power-iteration replica with the same per-iteration rounding, and
rank mass distributes by component size."""

from __future__ import annotations

from collections import Counter

import pytest

from wallaby2caom2_spark.queries.dedup import (
    _PR_DAMP,
    _PR_ITERS,
    dedup_pagerank_hubs,
)

_T1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
_T2 = "kilo lima mike november oscar papa quebec romeo sierra tango"


def _pr_ref(pairs):
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    deg = Counter(src for src, _ in edges)
    r = {v: round(1.0 / n, 12) for v in nodes}
    for _ in range(_PR_ITERS):
        s = dict.fromkeys(nodes, 0.0)
        for src, dst in edges:
            s[dst] += r[src] / deg[src]
        r = {
            v: round((1.0 - _PR_DAMP) / n + _PR_DAMP * s[v], 12)
            for v in nodes
        }
    return {v: round(r[v] + 1e-9, 6) for v in nodes}


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "docs")
    df.write.parquet(f"{d}/documents.parquet")
    return d


def test_matches_serial_power_iteration(spark, tmp_path):
    # a 4-clique (docs 1-4 identical) and a disjoint pair (10, 11)
    rows = [(i, _T1) for i in (1, 2, 3, 4)] + [(10, _T2), (11, _T2)]
    d = _write(spark, tmp_path, rows)
    got = {
        r["doc_id"]: r["pagerank"]
        for r in dedup_pagerank_hubs(spark, d).collect()
    }
    clique_pairs = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    want = _pr_ref(clique_pairs + [(10, 11)])
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6), v
    # within a clique every node has the same rank; total mass is 1
    assert len({got[i] for i in (1, 2, 3, 4)}) == 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)
