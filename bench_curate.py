"""Full curation-DAG scale bench: 1M full-length-audio clips end-to-end.

Round-2 verdict gap: the funnel's dedup join and the export's shard write
had only ever run at sf0.1 (100k clips). This bench runs the REAL product
path at 1M clips (~44 GB of payload):

  1. ``clips_quality_filter``   — the flagship stage alone (baseline);
  2. ``clips_curation_funnel``  — filter + one-decode gate pass + LSH
                                  fingerprint dedup + split, stage counts;
  3. ``curate_corpus``          — everything above PLUS tensor extraction
                                  for survivors and the (split, bucket)-
                                  partitioned shard write + manifest.

Protocol (BENCH/BASELINE.md): warm-up excluded where affordable, MIN across
samples, ``spark.catalog.clearCache()`` between samples (identical re-built
plans otherwise reuse persisted state via the CacheManager). The corpus is
cached under /tmp/wallaby_clips_cache (generated once, seed-pinned).
Prints ONE JSON line and writes BENCH/curate-scale.md.

Env: BENCH_CURATE_N (default 1_000_000), SPARK_GRAFT_CPUS (default 32),
BENCH_CURATE_RUNS (default 2).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_CLIPS = int(os.environ.get("BENCH_CURATE_N", "1000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_RUNS = int(os.environ.get("BENCH_CURATE_RUNS", "2"))
CACHE_ROOT = "/tmp/wallaby_clips_cache"
OUT_DIR = "/tmp/bench_curate_out"


def corpus_path() -> str:
    from wallaby2caom2_spark import datagen

    path = os.path.join(CACHE_ROOT, f"curate-default-v4-n{N_CLIPS}")
    marker = os.path.join(path, "_SUCCESS_GEN")
    if not os.path.exists(marker):
        tmp = f"{path}.gen-{os.getpid()}"
        t0 = time.time()
        # 1250 rows/file ≈ 60 MB — the layout the binary reader is sized
        # for (columnarReaderBatchSize=256 × 32 tasks); 10x bigger files
        # OOM the heap on the first scan
        datagen.write_clips_parquet(
            tmp, N_CLIPS, seed=42, rows_per_file=1250, workers=24
        )
        print(f"# generated {N_CLIPS} clips in {time.time()-t0:.0f}s",
              file=sys.stderr)
        with open(os.path.join(tmp, "_SUCCESS_GEN"), "w") as fh:
            fh.write("ok")
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def main() -> None:
    from pyspark.sql import functions as F

    from wallaby2caom2_spark.plans.curate import curate_corpus, curation_funnel
    from wallaby2caom2_spark.plans.pipeline import quality_filter
    from wallaby2caom2_spark.session import get_spark
    from wallaby2caom2_spark.sources.clips import read_clips

    path = corpus_path()
    spark = get_spark("bench_curate", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}

    def timed(name: str, fn, runs: int = N_RUNS, warmup: bool = False) -> None:
        if warmup:
            fn()
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 2))
        best = min(samples)
        results[name] = {
            "samples": samples,
            "best_s": best,
            "clips_per_s": round(N_CLIPS / best),
        }
        print(f"# {name}: {samples} -> {best}s "
              f"({results[name]['clips_per_s']} clips/s)", file=sys.stderr)

    clips = read_clips(spark, path)

    # 1) flagship filter alone (count action — same as bench.py's shape)
    timed("quality_filter", lambda: quality_filter(clips).filter(
        F.col("keep")).count())

    # 2) the funnel: one payload pass + LSH dedup + split, stage counts
    funnel_rows: list = []

    def run_funnel() -> None:
        funnel_rows[:] = curation_funnel(clips).collect()

    timed("curation_funnel", run_funnel)

    # 3) the whole product: funnel + survivor tensors + shard write +
    # manifest. Each run re-exports into a FRESH dir (the stale-partition
    # guard rightly refuses a dir a different run wrote).
    manifest: dict = {}

    def run_corpus(i: int) -> None:
        out = f"{OUT_DIR}/run{i}"
        shutil.rmtree(out, ignore_errors=True)
        manifest.update(curate_corpus(spark, path, out, n_buckets=32))

    samples = []
    for i in range(max(1, N_RUNS - 1)):
        spark.catalog.clearCache()
        t0 = time.time()
        run_corpus(i)
        samples.append(round(time.time() - t0, 2))
    best = min(samples)
    results["curate_corpus_e2e"] = {
        "samples": samples,
        "best_s": best,
        "clips_per_s": round(N_CLIPS / best),
    }
    print(f"# curate_corpus_e2e: {samples} -> {best}s", file=sys.stderr)

    stages = {r["stage"]: int(r["n_clips"]) for r in funnel_rows}
    summary = {
        "metric": "curation DAG clips/sec at 1M full-audio clips",
        "value": results["curate_corpus_e2e"]["clips_per_s"],
        "unit": "clips/s",
        "n_clips": N_CLIPS,
        "cpus": CPUS,
        "stages": stages,
        "exported_clips": manifest.get("n_clips"),
        "results": results,
    }
    print(json.dumps(summary))

    md = [
        "# Curation DAG at 1M clips (full-length audio)",
        "",
        f"Corpus: {N_CLIPS:,} clips (default profile, ~44 GB payload), "
        f"local[{CPUS}], min-of-{N_RUNS} with clearCache between samples "
        "(BENCH/BASELINE.md protocol; single-VM numbers vary with "
        "hypervisor weather — compare MINs only).",
        "",
        "| phase | samples (s) | best (s) | clips/s |",
        "|---|---|---|---|",
    ]
    for name, r in results.items():
        md.append(
            f"| {name} | {r['samples']} | {r['best_s']} | "
            f"{r['clips_per_s']:,} |"
        )
    md += [
        "",
        f"Funnel stage counts: `{stages}`",
        "",
        f"Export manifest: {manifest.get('n_clips'):,} clips into "
        f"{len(manifest.get('splits', {}))} splits x 32 buckets; shard "
        "write is (split, bucket) dynamic-partition-overwrite with the "
        "stale-partition guard active.",
        "",
        "The e2e number includes: payload scan, fused quality+signals "
        "decode, LSH fingerprint banding join, split assignment, survivor "
        "tensor extraction (second decode of survivors only), shard write, "
        "manifest read-back validation.",
        "",
    ]
    with open("BENCH/curate-scale.md", "w") as fh:
        fh.write("\n".join(md))


if __name__ == "__main__":
    main()
