"""Streaming front-end scale bench: the availableNow ingest path at scale.

Every other family has a scale record (audio/curate/dedup/corpus/media);
this one covers §2.7 — ``run_stream``'s REAL end-to-end cost, which the
batch benches never pay: file-source discovery, micro-batch planning, the
foreachBatch exactly-once sink (dynamic-overwrite results + metrics
parquet), and the streaming checkpoint commit per batch.

Three measurements on the same corpus:

  1. ``drain_one_batch``   — full backlog as ONE micro-batch (the
                             bounded-run shape the tests use);
  2. ``drain_chunked``     — same backlog chunked by maxFilesPerTrigger
                             into ~8 micro-batches (ingest-sized commits:
                             what a production backfill looks like, paying
                             per-batch sink + checkpoint overhead);
  3. ``noop_resume``       — immediate re-invocation with no new files
                             (bookmark already at head): the fixed cost of
                             "nothing to do", which at 10^12 scale is the
                             cost every scheduled tick pays.

Protocol (BENCH/BASELINE.md): each drain run starts from a FRESH out dir
(a warm drain would be a no-op by design), so drain times are single-shot
per layout — interleave ``BENCH_STREAM_ROUNDS`` rounds and report the MIN.
Prints ONE JSON line and writes BENCH/stream-scale.md.

Env: BENCH_STREAM_N (default 1_000_000 — reuses bench_curate's cached
corpus), SPARK_GRAFT_CPUS (default 32),
BENCH_STREAM_ROUNDS (default 2), BENCH_STREAM_CHUNKS (default 8).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_curate import CACHE_ROOT  # noqa: E402  (shared corpus cache)

N_CLIPS = int(os.environ.get("BENCH_STREAM_N", "1000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("BENCH_STREAM_ROUNDS", "2"))
CHUNKS = int(os.environ.get("BENCH_STREAM_CHUNKS", "8"))
OUT_ROOT = os.environ.get("BENCH_STREAM_OUT", "/dev/shm/bench_stream_out")
ROWS_PER_FILE = 1250  # the 60 MB layout the binary reader is sized for


def corpus_path() -> str:
    from wallaby2caom2_spark import datagen

    path = os.path.join(CACHE_ROOT, f"curate-default-v4-n{N_CLIPS}")
    marker = os.path.join(path, "_SUCCESS_GEN")
    if not os.path.exists(marker):
        tmp = f"{path}.gen-{os.getpid()}"
        t0 = time.time()
        datagen.write_clips_parquet(
            tmp, N_CLIPS, seed=42, rows_per_file=ROWS_PER_FILE, workers=24
        )
        print(
            f"# generated {N_CLIPS} clips in {time.time()-t0:.0f}s",
            file=sys.stderr,
        )
        with open(os.path.join(tmp, "_SUCCESS_GEN"), "w") as fh:
            fh.write("ok")
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def main() -> None:
    from wallaby2caom2_spark.session import get_spark
    from wallaby2caom2_spark.streaming.stream import run_stream

    path = corpus_path()
    n_files = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    per_trigger = max(1, n_files // CHUNKS)

    spark = get_spark("bench_stream", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    samples: dict[str, list[float]] = {
        "drain_one_batch": [],
        "drain_chunked": [],
        "noop_resume": [],
    }
    n_rows_seen = None

    for rnd in range(ROUNDS):
        for mode, mft in (("drain_one_batch", None), ("drain_chunked", per_trigger)):
            out = os.path.join(OUT_ROOT, mode)
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            run_stream(
                spark, path, out, n_buckets=32, max_files_per_trigger=mft
            )
            samples[mode].append(round(time.time() - t0, 2))
            if mode == "drain_chunked":
                # no-op resume measured against the chunked layout's
                # checkpoint (more committed batches = the worse case)
                t0 = time.time()
                run_stream(
                    spark, path, out, n_buckets=32, max_files_per_trigger=mft
                )
                samples["noop_resume"].append(round(time.time() - t0, 2))
                if n_rows_seen is None:
                    n_rows_seen = (
                        spark.read.parquet(os.path.join(out, "results")).count()
                    )
        print(f"# round {rnd}: {samples}", file=sys.stderr)

    spark.stop()
    assert n_rows_seen == N_CLIPS, (n_rows_seen, N_CLIPS)

    best = {k: min(v) for k, v in samples.items()}
    out_json = {
        "metric": "stream_drain_sec",
        "value": best["drain_one_batch"],
        "unit": "sec",
        "n_clips": N_CLIPS,
        "n_files": n_files,
        "clips_per_sec_one_batch": round(N_CLIPS / best["drain_one_batch"], 1),
        "clips_per_sec_chunked": round(N_CLIPS / best["drain_chunked"], 1),
        "chunked_batches": CHUNKS,
        "noop_resume_sec": best["noop_resume"],
        "samples": samples,
        "parallelism": CPUS,
    }
    print(json.dumps(out_json))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/stream-scale.md", "w") as fh:
        fh.write(
            "# Streaming ingest at scale (availableNow drain)\n\n"
            f"`run_stream` end-to-end over {N_CLIPS:,} full-audio clips in\n"
            f"{n_files} files at local[{CPUS}]: file-source discovery →\n"
            "fused quality-filter pipeline → exactly-once foreachBatch sink\n"
            "(dynamic-overwrite results + metrics parquet) → checkpoint\n"
            "commit. Protocol: fresh out dir per drain, interleaved rounds,\n"
            "MIN reported (BENCH/BASELINE.md).\n\n"
            "| mode | best sec | clips/sec | samples (sec) |\n"
            "|---|---|---|---|\n"
            f"| one-batch drain | {best['drain_one_batch']} | "
            f"{N_CLIPS / best['drain_one_batch']:,.0f} | "
            f"{samples['drain_one_batch']} |\n"
            f"| chunked drain ({CHUNKS} micro-batches of {per_trigger} "
            f"files) | {best['drain_chunked']} | "
            f"{N_CLIPS / best['drain_chunked']:,.0f} | "
            f"{samples['drain_chunked']} |\n"
            f"| no-op resume (bookmark at head) | {best['noop_resume']} | "
            f"— | {samples['noop_resume']} |\n\n"
            "A cold first sample additionally pays the one-time disk read\n"
            "of the whole corpus into page cache (tens of GB at ~100 MB/s\n"
            "on this VM's virtual disk) — the min-of-samples estimator\n"
            "reports the warm-IO cost, which is what a cluster with data\n"
            "on local NVMe or in the storage layer's cache would see.\n\n"
            "Reading: the chunked drain pays per-batch sink + checkpoint\n"
            "overhead (the production backfill shape — a crash resumes from\n"
            "the last committed batch, not from zero); the delta vs the\n"
            "one-batch drain IS that overhead. The no-op resume is the\n"
            "fixed cost of a scheduled tick that finds no new files —\n"
            "pure source-discovery + checkpoint read, no payload touched.\n"
            "At 10^12 clips the drain is partition-parallel (the pipeline\n"
            "stage is the same fused plan the batch benches measure); the\n"
            "per-tick floor stays O(listing), which an Iceberg snapshot\n"
            "source replaces with O(1) manifest reads.\n"
        )


if __name__ == "__main__":
    main()
