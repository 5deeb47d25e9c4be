"""Observation-document sink: in-plan JSON serialization, JSONL and
per-record-file forms, manifest + stale guard (closes the reference's
write-one-document-per-observation contract)."""

from __future__ import annotations

import json
import os

import pytest

from wallaby2caom2_spark.plans.export import (
    export_observation_documents,
    observation_documents,
)

SF = "/root/testdata/sf0.001"


def _docs_on_disk(out):
    root = os.path.join(out, "documents")
    docs = []
    for bdir in sorted(os.listdir(root)):
        if not bdir.startswith("bucket="):
            continue
        for name in sorted(os.listdir(os.path.join(root, bdir))):
            if name.startswith((".", "_")):  # crc/_SUCCESS metadata
                continue
            p = os.path.join(root, bdir, name)
            with open(p) as fh:
                body = fh.read()
            docs.append((name, body))
    return docs


def test_documents_are_deterministic_json(spark):
    rows = {r["doc_key"]: r["doc"] for r in observation_documents(spark, SF).collect()}
    assert len(rows) > 1000
    sample = json.loads(next(iter(rows.values())))
    assert set(sample) == {"obs_id", "owner", "date", "items"}
    lines = [it["line"] for it in sample["items"]]
    assert lines == sorted(lines)  # array_sort pinned the item order
    # re-running yields identical documents (determinism incl. item order)
    again = {r["doc_key"]: r["doc"] for r in observation_documents(spark, SF).collect()}
    assert again == rows


def test_jsonl_export_counts_and_content(spark, tmp_path):
    out = str(tmp_path / "out")
    manifest = export_observation_documents(spark, SF, out, n_buckets=4)
    assert manifest["format"] == "jsonl"
    expected = {r["doc"] for r in observation_documents(spark, SF).collect()}
    got = set()
    for _name, body in _docs_on_disk(out):
        got.update(ln for ln in body.splitlines() if ln)
    assert got == expected
    assert manifest["n_docs"] == len(expected)
    with open(os.path.join(out, "manifest.json")) as fh:
        assert json.load(fh) == manifest


def test_per_record_files_match_column(spark, tmp_path):
    out = str(tmp_path / "out_files")
    manifest = export_observation_documents(
        spark, SF, out, n_buckets=4, per_record_files=True
    )
    assert manifest["format"] == "json-file-per-record"
    expected = {
        f"{r['doc_key']}.json": r["doc"]
        for r in observation_documents(spark, SF).collect()
    }
    on_disk = dict(_docs_on_disk(out))
    assert on_disk == expected
    # every artifact parses as the observation document
    k, v = next(iter(on_disk.items()))
    assert json.loads(v)["obs_id"] == int(k.split(".")[0])


def test_jsonl_manifest_counts_utf8_bytes(spark, tmp_path):
    """Round-4 advice: the JSONL branch's read-back must count encoded
    BYTES (octet_length), not characters — the two branches' manifests
    must agree even though ASCII test docs cannot expose the difference,
    so assert against the encoded byte total directly."""
    out = str(tmp_path / "out_bytes")
    manifest = export_observation_documents(spark, SF, out, n_buckets=4)
    expected_bytes = sum(
        len(r["doc"].encode()) + 1
        for r in observation_documents(spark, SF).collect()
    )
    assert (
        sum(b["n_bytes"] for b in manifest["buckets"].values())
        == expected_bytes
    )
    # and octet_length is what the plan computes (a character count would
    # only coincide on pure-ASCII corpora — pin the expression itself)
    import inspect

    from wallaby2caom2_spark.plans import export as export_mod

    src = inspect.getsource(export_mod.export_observation_documents)
    assert "octet_length(doc) + 1" in src


def test_stale_guard(spark, tmp_path):
    out = str(tmp_path / "out_stale")
    export_observation_documents(spark, SF, out, n_buckets=4)
    foreign = os.path.join(out, "documents", "bucket=77")
    os.makedirs(foreign)
    with open(os.path.join(foreign, "zz"), "w") as fh:
        fh.write("{}")
    with pytest.raises(ValueError, match="stale buckets \\[77\\]"):
        export_observation_documents(spark, SF, out, n_buckets=4)
