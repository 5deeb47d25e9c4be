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
  merge      snapshot-table MERGE: --input parquet updates into the
             snapshot table at --output (created on first run); supports
             --order-col, --delete-where, --key, --n-buckets, and
             --write-mode cow|mor (mor = O(batch) merge-on-read delta
             append; resolution happens at read / snapshot-compact)
  rebucket   partition-spec evolution: re-hash the snapshot table at
             --output to --n-buckets buckets in one atomic full-rewrite
             commit (history stays readable under each version's spec)
  snapshot-compact  materialize pending merge-on-read deltas and collapse
             snapshot-dir fragmentation on the table at --output;
             --min-deltas K limits the rewrite to buckets with >= K
             pending deltas (incremental maintenance)
  cdc        keyed diff between two snapshot versions (--from-version /
             --to-version); row counts per change kind to stdout, full
             change set to --cdc-out as parquet when given
  expire     drop snapshot manifests/data older than --keep-last versions

The reference ships its maintenance operations as console entry points
(``setup.cfg:59-61`` wallaby_run / wallaby_run_state / …); merge/cdc/
expire are this repo's lakehouse equivalents, driving
``sources/snapshot_table.py`` end-to-end from spark-submit.
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
    "key": "clip_id",
    "order_col": None,
    "delete_where": None,
    "from_version": None,
    "to_version": None,
    "keep_last": 2,
    "cdc_out": None,
    "write_mode": "cow",
    "min_deltas": None,
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
        "--mode",
        choices=(
            "batch", "stream", "compact", "merge", "cdc", "expire",
            "snapshot-compact", "rebucket",
        ),
        default=None,
    )
    ap.add_argument("--target-mb", type=int, default=None)
    ap.add_argument("--n-buckets", type=int, default=None)
    ap.add_argument("--n-waves", type=int, default=None)
    ap.add_argument("--key", default=None, help="merge key column")
    ap.add_argument("--order-col", default=None, help="merge latest-wins order")
    ap.add_argument(
        "--delete-where", default=None,
        help="MERGE delete arm: SQL predicate over the update row",
    )
    ap.add_argument("--from-version", type=int, default=None)
    ap.add_argument("--to-version", type=int, default=None)
    ap.add_argument("--keep-last", type=int, default=None)
    ap.add_argument(
        "--cdc-out", default=None, help="write the cdc change set here (parquet)"
    )
    ap.add_argument(
        "--write-mode", default=None, choices=("cow", "mor"),
        help="merge write path: copy-on-write rewrite or merge-on-read delta",
    )
    ap.add_argument(
        "--min-deltas", type=int, default=None,
        help="snapshot-compact: only rewrite buckets with >= K pending deltas",
    )
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    for k in (
        "input", "output", "mode", "n_buckets", "n_waves", "target_mb",
        "key", "order_col", "delete_where", "from_version", "to_version",
        "keep_last", "cdc_out", "write_mode", "min_deltas",
    ):
        v = getattr(args, k)
        if v is not None:
            cfg[k] = v
    if cfg["mode"] in (
        "compact", "cdc", "expire", "snapshot-compact", "rebucket",
    ):
        if not cfg["output"]:
            ap.error(f"{cfg['mode']} mode needs --output (the table path)")
        if cfg["mode"] == "cdc" and cfg["from_version"] is None:
            ap.error("cdc mode needs --from-version")
    elif not cfg["input"] or not cfg["output"]:
        ap.error("input and output are required (flag or config)")

    if cfg["mode"] == "expire":
        # driver-side filesystem work only — no Spark session needed
        from wallaby2caom2_spark.sources import snapshot_table as st

        out = st.expire_snapshots(cfg["output"], keep_last=int(cfg["keep_last"]))
        out["mode"] = "expire"
        print(json.dumps(out))
        return 0

    # spark-submit provides the session; standalone runs build one
    from pyspark.sql import SparkSession

    from wallaby2caom2_spark.session import executor_jvm_count, get_spark

    active = SparkSession.getActiveSession()
    if active is None:
        spark = get_spark("wallaby2caom2_spark_job")
    else:
        spark = active
    spark.sparkContext.setLogLevel("WARN")

    if cfg["mode"] == "merge":
        from wallaby2caom2_spark.sources import snapshot_table as st

        updates = spark.read.parquet(cfg["input"])
        if not st.is_snapshot_table(cfg["output"]):
            st.create_table(
                spark, cfg["output"], updates, key=cfg["key"],
                n_buckets=int(cfg["n_buckets"]),
            )
            summary = {
                "mode": "merge",
                "created": True,
                "version": st.current_version(cfg["output"]),
                "rows": st.read_table(spark, cfg["output"]).count(),
            }
        else:
            summary = st.merge(
                spark, cfg["output"], updates,
                order_col=cfg.get("order_col"),
                delete_where=cfg.get("delete_where"),
                mode=cfg.get("write_mode") or "cow",
            )
            summary["mode"] = "merge"
            summary["created"] = False
    elif cfg["mode"] == "cdc":
        from wallaby2caom2_spark.sources import snapshot_table as st

        to_v = cfg.get("to_version")
        changes = st.snapshot_changes(
            spark, cfg["output"], int(cfg["from_version"]),
            None if to_v is None else int(to_v),
        )
        if cfg.get("cdc_out"):
            changes.write.mode("overwrite").parquet(cfg["cdc_out"])
            changes = spark.read.parquet(cfg["cdc_out"])  # count what landed
        by_kind = {
            r["change"]: r["n"]
            for r in changes.groupBy("change").count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        summary = {
            "mode": "cdc",
            "from_version": int(cfg["from_version"]),
            "to_version": to_v if to_v is None else int(to_v),
            "changes": by_kind,
            "cdc_out": cfg.get("cdc_out"),
        }
    elif cfg["mode"] == "rebucket":
        from wallaby2caom2_spark.sources import snapshot_table as st

        summary = st.rebucket(spark, cfg["output"], int(cfg["n_buckets"]))
        summary["mode"] = "rebucket"
    elif cfg["mode"] == "snapshot-compact":
        from wallaby2caom2_spark.sources import snapshot_table as st

        md = cfg.get("min_deltas")
        summary = st.compact(
            spark, cfg["output"],
            min_deltas=None if md is None else int(md),
        )
        summary["mode"] = "snapshot-compact"
    elif cfg["mode"] == "compact":
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
