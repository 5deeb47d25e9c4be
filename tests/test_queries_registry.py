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
    # clips/multimodal are the only rows-only entries (pandas-UDF stages)
    rows_only = set(q) - set(o)
    assert rows_only == {
        "clips_quality_filter",
        "clips_metrics",
        "clips_waveform_preview",
        "audio_fingerprint_neardup",
        "audio_segment_stats",
        "audio_normalize_stats",
        "audio_feature_stats",
        "audio_vad_stats",
        "audio_tonality_gate",
        "clips_curation_funnel",
        "audio_trim_stats",
        "audio_speed_perturb_stats",
        "audio_speaking_rate_gate",
        "audio_noise_mix_stats",
        "audio_dropout_stats",
    }
    for name, sql in o.items():
        assert sql.strip(), name


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
