"""Two-cluster-size scaling evidence (north rule: efficiency ≥ 0.8 at N vs 4N).

Sandbox proxy for N vs 4N executors: the same clips pipeline, same input,
at local[8] vs local[32].

Measurement problem: this sandbox VM suffers bursty hypervisor CPU
throttling — identical runs vary 5x+ (e.g. 12s vs 72s), uncorrelated with
parallelism, with guest CPU ~90% idle during slow runs. Medians therefore
measure the hypervisor, not the job. Protocol used instead:

- each (level, round) measurement runs in a fresh subprocess (own JVM),
  does one warm-up (excluded) then RUNS_PER_ROUND timed runs;
- levels are interleaved across ROUNDS rounds (8,32,8,32,…) so both levels
  sample the same throttling weather;
- per level we report the MINIMUM time across all rounds — the
  least-interference estimate of true capability — plus all samples for
  transparency.

    efficiency = (best_throughput@32 / best_throughput@8) / 4

Writes BENCH/scaling-{N}x{4N}.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# N and 4N parallelism pair; BENCH_LEVELS="4,16" measures the smaller pair
# (useful because this VM saturates memory bandwidth near 32 busy cores)
LEVELS = tuple(
    int(x) for x in os.environ.get("BENCH_LEVELS", "8,32").split(",")
)
ROUNDS = int(os.environ.get("BENCH_ROUNDS", "3"))
RUNS_PER_ROUND = int(os.environ.get("BENCH_RUNS", "3"))

# Scaling corpus: large + text-heavy so per-row CPU (langid/ppl/scrub)
# dominates fixed overheads — at 20k default-profile clips the whole job
# finishes in ~3.5s at local[8], leaving local[32] nothing to speed up.
SCALE_N = int(os.environ.get("BENCH_SCALE_N", "2000000"))  # the recorded protocol size — a smaller ad-hoc run would silently overwrite the evidence file
SCALE_CORPUS = f"/tmp/wallaby_clips_cache/scaling-text_heavy-v4-n{SCALE_N}"


def _ensure_corpus() -> str:
    """Private-tmpdir + atomic rename (the clips_path_for pattern): a
    concurrent generator must never expose a half-written part file."""
    marker = os.path.join(SCALE_CORPUS, "_SUCCESS_GEN")
    if not os.path.exists(marker):
        from wallaby2caom2_spark import datagen

        tmp = f"{SCALE_CORPUS}.gen-{os.getpid()}"
        datagen.write_clips_parquet(
            tmp,
            SCALE_N,
            seed=42,
            rows_per_file=12_500,
            profile="text_heavy",
            workers=16,
        )
        with open(os.path.join(tmp, "_SUCCESS_GEN"), "w") as fh:
            fh.write("ok")
        try:
            os.rename(tmp, SCALE_CORPUS)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return SCALE_CORPUS


def _measure_child(cpus: int) -> None:
    """Child mode: one warm-up + RUNS_PER_ROUND timed runs, JSON to stdout."""
    from pyspark.sql import functions as F

    from wallaby2caom2_spark.plans.pipeline import quality_filter
    from wallaby2caom2_spark.session import get_spark
    from wallaby2caom2_spark.sources.clips import read_clips

    clips_path = _ensure_corpus()
    spark = get_spark(f"bench_scaling_{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def force() -> None:
        quality_filter(read_clips(spark, clips_path)).agg(
            F.sum(F.length("scrubbed_transcript")),
            F.sum("scrub_edits"),
            F.sum("ppl"),
            F.sum(F.col("keep").cast("int")),
            F.sum("dur_ms_meas"),
        ).collect()

    n = read_clips(spark, clips_path).count()
    force()  # warm-ups, excluded: the reused python-UDF worker pool spawns
    force()  # lazily — two passes let it reach steady state
    samples = []
    for _ in range(RUNS_PER_ROUND):
        t0 = time.time()
        force()
        samples.append(round(time.time() - t0, 2))
    spark.stop()
    print("CHILD_RESULT " + json.dumps({"n": n, "samples": samples}))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--measure":
        _measure_child(int(sys.argv[2]))
        return

    _ensure_corpus()  # generate once, outside any timed region
    all_samples: dict[int, list[float]] = {lvl: [] for lvl in LEVELS}
    n_clips = 0
    for rnd in range(ROUNDS):
        for lvl in LEVELS:
            # taskset pins the WHOLE child tree (JVM + python UDF workers)
            # to lvl cores — without it, local[8]'s python workers are
            # separate processes free to use every core, silently inflating
            # the small "cluster" and faking poor scaling efficiency
            proc = subprocess.run(
                [
                    "taskset",
                    "-c",
                    # upper cores: CPU0 handles IRQs, so "0-7" would tax the
                    # small level with system noise the large level amortizes
                    f"{(os.cpu_count() or 32) - lvl}-{(os.cpu_count() or 32) - 1}",
                    sys.executable,
                    os.path.abspath(__file__),
                    "--measure",
                    str(lvl),
                ],
                capture_output=True,
                text=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
            )
            got_result = False
            for line in proc.stdout.splitlines():
                if line.startswith("CHILD_RESULT "):
                    payload = json.loads(line[len("CHILD_RESULT "):])
                    n_clips = payload["n"]
                    all_samples[lvl].extend(payload["samples"])
                    got_result = True
                    print(
                        f"# round {rnd} local[{lvl}]: {payload['samples']}",
                        file=sys.stderr,
                    )
            # a crashed/OOM'd child must not silently shrink the sample set
            # (a one-sided loss would skew the reported efficiency)
            if proc.returncode != 0 or not got_result:
                raise RuntimeError(
                    f"round {rnd} local[{lvl}] child failed "
                    f"(rc={proc.returncode}); stderr tail:\n"
                    + proc.stderr[-2000:]
                )

    results = {}
    for lvl in LEVELS:
        best = min(all_samples[lvl])
        results[lvl] = {
            "best_sec": best,
            "clips_per_sec_best": round(n_clips / best, 1),
            "median_sec": round(statistics.median(all_samples[lvl]), 2),
            "samples_sec": all_samples[lvl],
        }

    lo, hi = LEVELS
    eff = (
        results[hi]["clips_per_sec_best"] / results[lo]["clips_per_sec_best"]
    ) / (hi / lo)
    out = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "estimator": "min-of-samples (least hypervisor interference)",
        "levels": {str(k): v for k, v in results.items()},
        "n_clips": n_clips,
        "corpus": SCALE_CORPUS,
        "rounds": ROUNDS,
        "runs_per_round": RUNS_PER_ROUND,
    }
    print(json.dumps(out))

    os.makedirs("BENCH", exist_ok=True)
    with open(f"BENCH/scaling-{lo}x{hi}.md", "w") as fh:
        fh.write(
            "# BENCH/BASELINE — two-cluster-size scaling evidence\n\n"
            "North rule: throughput scaling efficiency >= 0.8 between N and 4N\n"
            "executors. Sandbox proxy (driver instruction): same job + same\n"
            f"input at local[{lo}] vs local[{hi}] on the deterministic clips\n"
            f"table ({n_clips} clips, seed 42).\n\n"
            "## Why min-of-samples\n\n"
            "This VM shows bursty hypervisor CPU throttling: identical runs\n"
            "vary 5x+ (guest ~90% idle during slow runs, load-avg ~12 with no\n"
            "guest processes). Medians measure the throttling, not the job, so\n"
            "levels are interleaved across rounds in fresh JVMs and the MIN\n"
            "per level (least-interference window) is the throughput\n"
            "estimate; all samples are listed for transparency.\n\n"
            "| parallelism | best sec | best clips/sec | median sec | samples (sec) |\n"
            "|---|---|---|---|---|\n"
            + "".join(
                f"| local[{k}] | {v['best_sec']} | {v['clips_per_sec_best']} | "
                f"{v['median_sec']} | {v['samples_sec']} |\n"
                for k, v in results.items()
            )
            + f"\n**Scaling efficiency (best-vs-best): {eff:.3f}**\n\n"
            "Design basis for scaling: after decode, the payload column is\n"
            "dropped and the only shuffle moves ~300 B/row; every stage is\n"
            "embarrassingly parallel over salted hash partitions, so the plan\n"
            "has no serial section to cap speedup at 4x cores.\n"
        )


if __name__ == "__main__":
    main()
