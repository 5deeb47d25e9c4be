"""Driver-contract registry invariants (no Spark needed) + a sf0.001 spot
check of representative queries against DuckDB — the in-repo replica of the
driver's correctness gate (scripts/check_oracle.py runs the full set)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from scripts.check_oracle import value_hash

SF_DIR = "/root/testdata/sf0.001"


def test_registry_shape():
    q = entry.queries()
    o = entry.oracle_sql()
    assert len(q) >= 20
    assert set(o) <= set(q)
    # since round 3 EVERY query carries a DuckDB oracle: the clips family
    # replays from the pure-Python fixture (wallaby2caom2_spark/fixtures.py)
    rows_only = set(q) - set(o)
    assert rows_only == set()
    for name, sql in o.items():
        assert sql.strip(), name


def test_manifest_in_sync_with_registry():
    """docs/QUERIES.json is the committed, machine-readable registry view
    (name → family → oracle kind → backing pytest) — regenerate it here and
    fail on drift so any correctness-gate sampler always sees what each
    rows-only entry is backed by."""
    import os

    from wallaby2caom2_spark.queries import manifest as m

    generated = m.manifest_json()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "docs", "QUERIES.json")
    with open(path) as fh:
        committed = fh.read()
    assert committed == generated, (
        "docs/QUERIES.json is stale — regenerate with: python -c "
        '"from wallaby2caom2_spark.queries.manifest import manifest_json; '
        "open('docs/QUERIES.json','w').write(manifest_json())\""
    )
    built = m.build_manifest()
    # every registry query appears exactly once
    assert set(built) == set(entry.queries())
    # every rows-only entry names an existing pytest file
    for name, info in built.items():
        if not info["has_oracle"]:
            assert info["backing_pytest"], name
            assert os.path.exists(os.path.join(repo, info["backing_pytest"])), name
    # oracle bookkeeping matches the live oracle_sql() surface
    live_oracles = set(entry.oracle_sql())
    assert {n for n, i in built.items() if i["has_oracle"]} == live_oracles


@pytest.mark.parametrize(
    "name",
    [
        "doc_rule_cascade",
        "pricing_summary",
        "rejected_anti_join",
        "dedup_simhash",
        "similarity_topk_bruteforce",
        "nested_order_assembly",
        "text_quality_score",
        "dedup_connected_components",
        "decontaminate_ngram",
        "sample_token_budget",
        "sample_mixture_quota",
        "events_asof_join",
        "events_range_join",
        "kmeans_train",
        "semantic_cluster_dedup",
        "dedup_exact_substring",
        "classifier_train_logreg",
        "events_lag_delta",
        "events_pivot_by_type",
        "value_histogram",
        "text_linear_classifier",
        "top_unshipped_orders",
        "distinct_users_two_phase",
    ],
)
def test_spot_oracle_match(spark, name):
    fn = entry.queries()[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    res = con.execute(entry.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert value_hash(scols, srows) == value_hash(ocols, orows)
