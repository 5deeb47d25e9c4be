"""Partition-spec evolution (``rebucket``): bucket-count change as one
atomic full-rewrite commit. Content must be byte-stable across the
re-hash, history must stay readable under each version's OWN spec, and
subsequent merges must use the new spec."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from wallaby2caom2_spark.sources import snapshot_table as st

SCHEMA = "clip_id string, val string, seq int"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(spark, path, version=None):
    return {
        r["clip_id"]: (r["val"], r["seq"])
        for r in st.read_table(spark, path, version=version).collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "rb_tbl")
    st.create_table(
        spark,
        path,
        _df(spark, [(f"c{i:03d}", f"v0_{i}", 0) for i in range(60)]),
        key="clip_id",
        n_buckets=4,
    )
    return path


def test_rebucket_preserves_content_and_updates_spec(spark, table):
    before = _state(spark, table)
    out = st.rebucket(spark, table, 8)
    assert out["n_buckets_before"] == 4 and out["n_buckets"] == 8
    m = st.read_manifest(table)
    assert m["n_buckets"] == 8
    assert _state(spark, table) == before
    # buckets are genuinely re-hashed under the new spec
    got = {
        (r["clip_id"], r["bucket"])
        for r in st.read_table(spark, table).collect()
    }
    want = {
        (r["clip_id"], r["bucket"])
        for r in st.with_bucket(
            _df(spark, [(f"c{i:03d}", f"v0_{i}", 0) for i in range(60)]), 8
        ).collect()
    }
    assert got == want
    # fresh zone maps under the new spec
    assert set(m["stats"]) == set(m["buckets"])


def test_rebucket_resolves_pending_mor_deltas(spark, table):
    st.merge(spark, table, _df(spark, [("c001", "u1", 1)]), mode="mor")
    st.rebucket(spark, table, 8)
    m = st.read_manifest(table)
    assert "deltas" not in m or not m["deltas"]
    assert _state(spark, table)["c001"] == ("u1", 1)


def test_time_travel_reads_each_version_under_its_own_spec(spark, table):
    v0 = _state(spark, table, version=0)
    st.rebucket(spark, table, 8)
    old = st.read_table(spark, table, version=0)
    assert {r["clip_id"]: (r["val"], r["seq"]) for r in old.collect()} == v0
    # old version still carries the old spec's bucket values (0..3)
    assert old.agg(F.max("bucket")).collect()[0][0] <= 3
    # CDC across the rebucket commit: content identical -> empty
    v = st.current_version(table)
    assert st.snapshot_changes(spark, table, v - 1, v).count() == 0


def test_merge_after_rebucket_uses_new_spec(spark, table):
    st.rebucket(spark, table, 8)
    out = st.merge(spark, table, _df(spark, [("zz9", "new", 1)]))
    assert out["inserted"] == 1
    want_bucket = st.with_bucket(
        _df(spark, [("zz9", "new", 1)]), 8
    ).collect()[0]["bucket"]
    assert out["touched_buckets"] == [want_bucket]
    got = (
        st.read_table(spark, table)
        .filter(F.col("clip_id") == "zz9")
        .collect()[0]
    )
    assert got["bucket"] == want_bucket


def test_cli_rebucket_mode(spark, table, capsys):
    import json as _json
    import sys

    sys.path.insert(0, "scripts")
    try:
        from run_job import main
    finally:
        sys.path.pop(0)

    before = _state(spark, table)
    rc = main(["--mode", "rebucket", "--output", table, "--n-buckets", "8"])
    assert rc == 0
    s = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["mode"] == "rebucket" and s["n_buckets"] == 8
    assert st.read_manifest(table)["n_buckets"] == 8
    assert _state(spark, table) == before


def test_rebucket_rejects_noop_and_bad_counts(spark, table):
    with pytest.raises(ValueError, match="already has"):
        st.rebucket(spark, table, 4)
    with pytest.raises(ValueError, match=">= 1"):
        st.rebucket(spark, table, 0)


def test_rebucket_commit_is_conflict_checked(spark, table, tmp_path):
    """A merge that committed between the rebucket's base read and its
    commit must win or lose atomically — never a torn spec."""
    base = st.read_manifest(table)
    st.merge(spark, table, _df(spark, [("c001", "u1", 1)]))  # advances v
    df = st._read_buckets(spark, table, base, None).drop("bucket")
    df = st.with_bucket(df, 8, key=base["key"])
    _sid, dirs, stats = st._write_snapshot_files(df, table, 8)
    manifest = {
        "key": base["key"],
        "n_buckets": 8,
        "buckets": {str(b): d for b, d in dirs.items()},
        "schema": base["schema"],
        "stats": stats,
    }
    with pytest.raises(st.SnapshotConflictError):
        st._commit(table, manifest, base["version"] + 1, base["version"])
    # table unharmed: still at the merge's version, old spec
    m = st.read_manifest(table)
    assert m["n_buckets"] == 4
    assert _state(spark, table)["c001"] == ("u1", 1)
