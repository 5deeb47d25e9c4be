"""Corpus/curation-op scale bench: iterative BPE training, hash split,
normalization pass, and rule ablation at >=1M docs.

Reuses bench_dedup's deterministic 1M-doc documents-shaped corpus and times
the registry's own plans end-to-end at local[$SPARK_GRAFT_CPUS]. Same
protocol as the other benches (BENCH/BASELINE.md): one warm-up excluded,
N_RUNS timed runs, MIN reported, all samples listed. Prints ONE JSON line
and writes BENCH/corpus-scale.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_dedup import N_DOCS, _ensure_corpus  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_RUNS = int(os.environ.get("BENCH_RUNS", "3"))

QUERIES = (
    "bpe_train_merges",
    "split_train_valid_test",
    "text_normalize_stats",
    "quality_rule_ablation",
)


def main() -> None:
    from wallaby2caom2_spark.queries import ALL_QUERIES
    from wallaby2caom2_spark.session import get_spark

    sf_dir = _ensure_corpus()
    spark = get_spark("bench_corpus", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for qname in QUERIES:
        fn = ALL_QUERIES[qname]
        fn(spark, sf_dir).collect()  # warm-up
        samples = []
        for _ in range(N_RUNS):
            # a re-built identical plan reuses the previous sample's
            # persisted state (CacheManager plan-dedupe) — e.g. the BPE
            # trainer's vocabulary table — so clear first: each sample is
            # the full cold job including the corpus-scale shuffle
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).collect()
            samples.append(round(time.time() - t0, 2))
        best = min(samples)
        results[qname] = {
            "best_sec": best,
            "docs_per_sec_best": round(N_DOCS / best, 1),
            "samples_sec": samples,
        }
    spark.stop()

    payload = {
        "metric": "corpus_ops_scale_bench",
        "value": results["bpe_train_merges"]["best_sec"],
        "unit": "sec",
        "n_docs": N_DOCS,
        "parallelism": CPUS,
        "queries": results,
    }
    print(json.dumps(payload))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/corpus-scale.md", "w") as fh:
        fh.write(
            "# BENCH — corpus/curation ops at 1M docs\n\n"
            f"Corpus: bench_dedup's deterministic {N_DOCS:,}-doc documents-"
            f"shaped table, local[{CPUS}]. Registry plans, min-of-"
            f"{N_RUNS} after a warm-up (host-throttling protocol, "
            "BENCH/BASELINE.md).\n\n"
            "`bpe_train_merges` is the interesting one at scale: the corpus "
            "collapses once to its vocabulary (the only corpus-scale "
            "shuffle, persisted), then every one of the 6 merge rounds is a "
            "vocabulary-sized aggregation + a 1-row argmax collect + a "
            "codegen replace — so its cost is corpus-bound only on the "
            "first pass.\n\n"
            "| query | best sec | docs/sec | samples |\n|---|---|---|---|\n"
        )
        for q, r in results.items():
            fh.write(
                f"| {q} | {r['best_sec']} | "
                f"{r['docs_per_sec_best']:,} | {r['samples_sec']} |\n"
            )


if __name__ == "__main__":
    main()
