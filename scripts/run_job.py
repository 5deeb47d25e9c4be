"""spark-submit entry point for the quality-filter pipeline.

North-rule launch shape:

    zip -r pipeline.zip wallaby2caom2_spark
    spark-submit --py-files pipeline.zip scripts/run_job.py --config run.yml

Config-driven like the reference (``config/config.yml`` selects tasks,
extensions, retry bookkeeping — ``wallaby2caom2/composable.py:122-123``):
one YAML file declares input, output, bucketing, and mode. On a cluster the
same script runs unchanged — only master/memory flags move to spark-submit.

Modes:
  batch      resumable wave runner (checkpoint → exactly-once re-runs)
  stream     availableNow structured-streaming front-end (checkpoint bookmark)
  compact    small-files compaction of an existing results table
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# allow running from the repo checkout without --py-files
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    import yaml  # type: ignore
except ImportError:  # pragma: no cover - container has pyyaml via pyspark
    yaml = None


DEFAULTS = {
    "mode": "batch",
    "input": None,
    "output": None,
    "n_buckets": 64,
    "n_waves": 8,
    "run_id": None,
    "target_mb": 128,
}


def load_config(path: str | None) -> dict:
    cfg = dict(DEFAULTS)
    if path:
        with open(path) as fh:
            text = fh.read()
        loaded = (
            yaml.safe_load(text) if yaml is not None else json.loads(text)
        )
        cfg.update(loaded or {})
    return cfg


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="YAML (or JSON) run config")
    ap.add_argument("--input", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument(
        "--mode", choices=("batch", "stream", "compact"), default=None
    )
    ap.add_argument("--target-mb", type=int, default=None)
    ap.add_argument("--n-buckets", type=int, default=None)
    ap.add_argument("--n-waves", type=int, default=None)
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    for k in ("input", "output", "mode", "n_buckets", "n_waves", "target_mb"):
        v = getattr(args, k.replace("-", "_"))
        if v is not None:
            cfg[k] = v
    if cfg["mode"] == "compact":
        if not cfg["output"]:
            ap.error("compact mode needs --output (the results table)")
    elif not cfg["input"] or not cfg["output"]:
        ap.error("input and output are required (flag or config)")

    # spark-submit provides the session; standalone runs build one
    from pyspark.sql import SparkSession

    from wallaby2caom2_spark.session import executor_jvm_count, get_spark

    active = SparkSession.getActiveSession()
    if active is None:
        spark = get_spark("wallaby2caom2_spark_job")
    else:
        spark = active
    spark.sparkContext.setLogLevel("WARN")

    if cfg["mode"] == "compact":
        from wallaby2caom2_spark.plans.maintenance import compact_results_job

        summary = compact_results_job(
            spark,
            os.path.join(cfg["output"], "results"),
            target_mb=int(cfg["target_mb"]),
        )
        summary["mode"] = "compact"
    elif cfg["mode"] == "stream":
        from wallaby2caom2_spark.streaming.stream import run_stream

        run_stream(
            spark, cfg["input"], cfg["output"], n_buckets=int(cfg["n_buckets"])
        )
        summary = {"mode": "stream", "output": cfg["output"]}
    else:
        from wallaby2caom2_spark.plans.runner import run_resumable

        summary = run_resumable(
            spark,
            cfg["input"],
            cfg["output"],
            n_buckets=int(cfg["n_buckets"]),
            n_waves=int(cfg["n_waves"]),
            run_id=cfg.get("run_id"),
        )
    # cluster-topology bookkeeping: how many executor JVMs actually served
    # the run (shared probe, None on private-API drift)
    summary["executors"] = executor_jvm_count(spark)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
