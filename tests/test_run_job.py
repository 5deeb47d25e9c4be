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


def test_snapshot_modes_in_session(spark, tmp_path, capsys):
    """merge → merge(+delete) → cdc → expire through the CLI dispatch,
    reusing the active session (round-4 verdict #8: the snapshot-table
    ops get console entry points like the reference's maintenance
    scripts, ``setup.cfg:59-61``)."""
    tbl = str(tmp_path / "tbl")
    w1 = str(tmp_path / "w1")
    w2 = str(tmp_path / "w2")
    spark.createDataFrame(
        [("a", "v0", 0), ("b", "v0", 0), ("c", "v0", 0)],
        "clip_id string, val string, seq int",
    ).write.parquet(w1)
    spark.createDataFrame(
        [("a", "DEL", 1), ("b", "v1", 1), ("d", "new", 1)],
        "clip_id string, val string, seq int",
    ).write.parquet(w2)

    # first merge bootstraps the table
    rc = main(["--mode", "merge", "--input", w1, "--output", tbl,
               "--n-buckets", "4"])
    assert rc == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["created"] is True and s1["rows"] == 3 and s1["version"] == 0

    # second merge: update + insert + delete arm
    rc = main(["--mode", "merge", "--input", w2, "--output", tbl,
               "--order-col", "seq", "--delete-where", "val = 'DEL'"])
    assert rc == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (s2["updated"], s2["inserted"], s2["deleted"]) == (1, 1, 1)

    # cdc between the two versions, materialized to parquet
    cdc_out = str(tmp_path / "cdc")
    rc = main(["--mode", "cdc", "--output", tbl, "--from-version", "0",
               "--to-version", "1", "--cdc-out", cdc_out])
    assert rc == 0
    s3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s3["changes"] == {"updated": 1, "inserted": 1, "deleted": 1}
    cdc = {r["clip_id"]: r["change"]
           for r in spark.read.parquet(cdc_out).collect()}
    assert cdc == {"a": "deleted", "b": "updated", "d": "inserted"}

    # expire keeps only the newest version
    rc = main(["--mode", "expire", "--output", tbl, "--keep-last", "1"])
    assert rc == 0
    s4 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s4["kept_versions"] == [1]
    assert s4["removed_manifest_versions"] == [0]


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


def test_spark_submit_snapshot_merge_and_cdc(tmp_path):
    """The lakehouse ops from the OUTSIDE: spark-submit --py-files drives
    a snapshot-table bootstrap merge, a delete-arm merge, and a CDC read
    in three separate JVM launches against the same table path — the
    deployment shape a cluster operator would actually run."""
    import os
    import subprocess
    import sys

    repo, zpath = _package_zip(tmp_path)
    tbl = str(tmp_path / "tbl")
    w1 = str(tmp_path / "w1")
    w2 = str(tmp_path / "w2")
    cdc_out = str(tmp_path / "cdc")

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT 'a' AS clip_id, 'v0' AS val, 0 AS seq UNION ALL "
        f"SELECT 'b', 'v0', 0 UNION ALL SELECT 'c', 'v0', 0) "
        f"TO '{w1}' (FORMAT parquet)"
    )
    con.execute(
        f"COPY (SELECT 'a' AS clip_id, 'DEL' AS val, 1 AS seq UNION ALL "
        f"SELECT 'b', 'v1', 1 UNION ALL SELECT 'd', 'new', 1) "
        f"TO '{w2}' (FORMAT parquet)"
    )

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    base = [
        _spark_submit_bin(), "--master", "local[2]",
        "--driver-memory", "2g", "--py-files", zpath,
        os.path.join(repo, "scripts", "run_job.py"),
    ]

    def submit(*args):
        proc = subprocess.run(
            base + list(args), capture_output=True, text=True,
            timeout=420, env=env, cwd=str(tmp_path),
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    s1 = submit("--mode", "merge", "--input", w1, "--output", tbl,
                "--n-buckets", "4")
    assert s1["created"] is True and s1["rows"] == 3

    s2 = submit("--mode", "merge", "--input", w2, "--output", tbl,
                "--order-col", "seq", "--delete-where", "val = 'DEL'")
    assert (s2["updated"], s2["inserted"], s2["deleted"]) == (1, 1, 1)

    s3 = submit("--mode", "cdc", "--output", tbl, "--from-version", "0",
                "--to-version", "1", "--cdc-out", cdc_out)
    assert s3["changes"] == {"updated": 1, "inserted": 1, "deleted": 1}
    rows = dict(
        con.sql(
            f"SELECT clip_id, change FROM read_parquet('{cdc_out}/*.parquet')"
        ).fetchall()
    )
    assert rows == {"a": "deleted", "b": "updated", "d": "inserted"}
