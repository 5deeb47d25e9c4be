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


def _package_zip(tmp_path):
    """zip -r pipeline.zip wallaby2caom2_spark — the literal --py-files
    artifact; returns (repo_root, zip_path)."""
    import os
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "wallaby2caom2_spark")
    zpath = str(tmp_path / "pipeline.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, repo))
    return repo, zpath


def _spark_submit_bin():
    import os
    import shutil
    import sys

    return shutil.which("spark-submit") or os.path.join(
        os.path.dirname(os.path.dirname(sys.executable)), "bin", "spark-submit"
    )


def test_spark_submit_py_files_launch(tmp_path):
    """The LITERAL north-rule launch shape: package the library as a zip,
    launch a fresh JVM via ``spark-submit --py-files pipeline.zip``, and
    assert the job's results from the outside.  This is the cluster path —
    nothing from this checkout is importable in the child except through
    the zip and the submitted script."""
    import os
    import subprocess
    import sys

    repo, zpath = _package_zip(tmp_path)

    inp = str(tmp_path / "clips")
    out = str(tmp_path / "out")
    datagen.write_clips_parquet(inp, 100, seed=43, rows_per_file=50)

    spark_submit = _spark_submit_bin()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--driver-memory", "2g",
            "--py-files", zpath,
            os.path.join(repo, "scripts", "run_job.py"),
            "--input", inp, "--output", out,
            "--n-buckets", "2", "--n-waves", "1",
        ],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),  # not the repo root — no accidental cwd imports
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["buckets"] == [0, 1]

    import duckdb

    con = duckdb.connect()
    n, nd = con.sql(
        f"SELECT count(*), count(DISTINCT clip_id) "
        f"FROM read_parquet('{out}/results/*/*.parquet', "
        f"hive_partitioning=true)"
    ).fetchone()
    assert (n, nd) == (100, 100)


def test_spark_submit_multi_executor_cluster(tmp_path):
    """The north-rule cluster topology for real: ``spark-submit --py-files``
    against ``local-cluster[2,2,1536]`` — TWO separate executor JVM
    processes (not local[N] threads), netty shuffle service between them,
    one python-worker pool per executor. Everything the job needs must
    actually distribute: the zip ships to each executor, the pandas-UDF
    stages run in per-executor python workers, and the bucketed exchange
    crosses process boundaries. Asserts the same exactly-once result
    contract as the single-JVM launch."""
    import os
    import subprocess
    import sys

    repo, zpath = _package_zip(tmp_path)
    inp = str(tmp_path / "clips")
    out = str(tmp_path / "out")
    datagen.write_clips_parquet(inp, 100, seed=47, rows_per_file=50)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit_bin(),
            "--master", "local-cluster[2,2,1536]",
            "--driver-memory", "2g",
            "--conf", "spark.executor.memory=1536m",
            "--py-files", zpath,
            os.path.join(repo, "scripts", "run_job.py"),
            "--input", inp, "--output", out,
            "--n-buckets", "2", "--n-waves", "1",
        ],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["buckets"] == [0, 1]
    # the work really ran on remote executors: the driver saw two
    # executor block-manager endpoints besides its own
    assert summary["executors"] == 2, summary

    import duckdb

    con = duckdb.connect()
    n, nd = con.sql(
        f"SELECT count(*), count(DISTINCT clip_id) "
        f"FROM read_parquet('{out}/results/*/*.parquet', "
        f"hive_partitioning=true)"
    ).fetchone()
    assert (n, nd) == (100, 100)
