"""spark-submit entry-point test (reference analog: the composable
entry-point tests, ``wallaby2caom2/tests/test_composable.py:189-245`` —
drive the packaged runner end to end, assert the bookkeeping)."""

from __future__ import annotations

import json

from wallaby2caom2_spark import datagen
from scripts.run_job import load_config, main


def test_load_config_defaults_and_overrides(tmp_path):
    cfg = load_config(None)
    assert cfg["mode"] == "batch" and cfg["n_buckets"] == 64
    p = tmp_path / "run.yml"
    p.write_text("mode: stream\nn_buckets: 4\ninput: /a\noutput: /b\n")
    cfg = load_config(str(p))
    assert cfg["mode"] == "stream"
    assert cfg["n_buckets"] == 4
    assert cfg["input"] == "/a"


def test_batch_job_end_to_end(spark, tmp_path, capsys):
    """main() reuses the active session (the spark-submit path) and runs the
    resumable batch pipeline; a second invocation is an exactly-once no-op."""
    inp = str(tmp_path / "clips")
    out = str(tmp_path / "out")
    datagen.write_clips_parquet(inp, 200, seed=41, rows_per_file=100)

    rc = main(["--input", inp, "--output", out, "--n-buckets", "2",
               "--n-waves", "1"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["buckets"] == [0, 1]
    res = spark.read.parquet(f"{out}/results")
    assert res.count() == 200
    assert res.select("clip_id").distinct().count() == 200

    rc = main(["--input", inp, "--output", out, "--n-buckets", "2",
               "--n-waves", "1"])
    assert rc == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2.get("waves", 0) == 0  # nothing left to do
    assert spark.read.parquet(f"{out}/results").count() == 200
