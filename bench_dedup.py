"""Dedup-family scale bench: MinHash signatures + LSH banding at >=1M docs.

The driver's sf0.1 documents table is ~5k rows — fine for correctness,
useless as scale evidence. This harness synthesizes a deterministic
documents-shaped corpus (same schema: doc_id, text, lang, source, n_chars;
~150 words/doc, 10% planted near-duplicates) at BENCH_DEDUP_N docs
(default 1,000,000), then times the registry's own `dedup_minhash_signature`
and `dedup_lsh_bands` plans end-to-end at local[$SPARK_GRAFT_CPUS].

Protocol (see BENCH/BASELINE.md): one warm-up excluded, N_RUNS timed runs,
MIN reported (bursty hypervisor throttling on this VM makes medians measure
the weather); all samples listed. Prints ONE JSON line and writes
BENCH/dedup-scale.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = int(os.environ.get("BENCH_DEDUP_N", "1000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_RUNS = int(os.environ.get("BENCH_RUNS", "3"))
CORPUS = f"/tmp/wallaby_docs_cache/dedup-v1-n{N_DOCS}"
ROWS_PER_FILE = 50_000

_VOCAB = np.array(
    [
        f"{a}{b}{c}"
        for a in ("re", "un", "pro", "con", "de", "in", "ex", "sub")
        for b in ("lat", "ver", "pos", "duc", "mit", "ced", "tain", "form")
        for c in ("ion", "ive", "ed", "ing", "er", "ly", "ment", "al")
    ]
)  # 512 synthetic word stems
_LANGS = np.array(["en", "fr", "de", "es"])
_SOURCES = np.array(["web", "books", "wiki", "forum"])


def _write_chunk(args: tuple) -> None:
    path, part, start, count = args
    rng = np.random.default_rng(
        np.random.SeedSequence(entropy=4242, spawn_key=(part,))
    )
    lens = rng.integers(120, 180, size=count)
    texts: list[str] = []
    for i in range(count):
        words = _VOCAB[rng.integers(0, len(_VOCAB), size=lens[i])]
        t = " ".join(words)
        texts.append(t)
        # plant near-duplicates: every 10th doc copies the previous one
        # with a single word swapped (MinHash/LSH must bucket these)
        if i % 10 == 9 and i > 0:
            prev = texts[-2].split(" ")
            prev[int(rng.integers(0, len(prev)))] = str(_VOCAB[0])
            texts[-1] = " ".join(prev)
    ids = np.arange(start, start + count)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(_LANGS[ids % 4], pa.string()),
            "source": pa.array(_SOURCES[(ids // 4) % 4], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(path, f"documents-{part:05d}.parquet"))


def _ensure_corpus() -> str:
    """Generate into a process-private temp dir + atomic rename (the
    clips_path_for pattern): two concurrent benches sharing this cache
    must never scan a half-written part file."""
    marker = os.path.join(CORPUS, "_SUCCESS_GEN")
    if not os.path.exists(marker):
        tmp = f"{CORPUS}.gen-{os.getpid()}"
        docs_dir = os.path.join(tmp, "documents.parquet")
        os.makedirs(docs_dir, exist_ok=True)
        jobs = [
            (docs_dir, part, start, min(ROWS_PER_FILE, N_DOCS - start))
            for part, start in enumerate(range(0, N_DOCS, ROWS_PER_FILE))
        ]
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=16) as pool:
            list(pool.map(_write_chunk, jobs))
        with open(os.path.join(tmp, "_SUCCESS_GEN"), "w") as fh:
            fh.write("ok")
        try:
            os.rename(tmp, CORPUS)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return CORPUS


def main() -> None:
    from pyspark.sql import functions as F

    from wallaby2caom2_spark.queries.dedup import (
        dedup_connected_components,
        dedup_lsh_bands,
        dedup_minhash_signature,
    )
    from wallaby2caom2_spark.session import get_spark

    sf_dir = _ensure_corpus()
    spark = get_spark("bench_dedup", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    corpus_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(sf_dir, "documents.parquet"))
        for f in fs
    )

    def force_sig():
        # sum one signature column per hash → every md5/min materializes
        df = dedup_minhash_signature(spark, sf_dir)
        df.agg(
            *[F.count(c) for c in df.columns if c.startswith("sig")]
        ).collect()

    def force_bands():
        return dedup_lsh_bands(spark, sf_dir).collect()

    cc_stats = {}

    def force_cc():
        # full composed path: signatures → banding → candidate pairs →
        # exact-Jaccard verify → iterative min-label connected components
        out = dedup_connected_components(spark, sf_dir)
        agg = out.agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("component").alias("n_components"),
        ).collect()[0]
        cc_stats["docs_in_components"] = agg["n_docs"]
        cc_stats["n_components"] = agg["n_components"]

    results: dict[str, dict] = {}
    pairs = None
    for name, fn in (
        ("minhash_signature", force_sig),
        ("lsh_bands", force_bands),
        ("connected_components", force_cc),
    ):
        fn()  # warm-up
        samples = []
        for _ in range(N_RUNS):
            # cold-path samples: identical re-built plans otherwise reuse
            # persisted intermediates (CacheManager plan-dedupe), e.g. the
            # connected-components iteration state
            spark.catalog.clearCache()
            t0 = time.time()
            out = fn()
            samples.append(round(time.time() - t0, 2))
        if name == "lsh_bands" and out:
            pairs = sum(r["n_candidate_pairs"] for r in out)
        best = min(samples)
        results[name] = {
            "best_sec": best,
            "docs_per_sec_best": round(N_DOCS / best, 1),
            "samples_sec": samples,
        }
    spark.stop()

    payload = {
        "metric": "dedup_scale_bench",
        "value": results["lsh_bands"]["best_sec"],
        "unit": "sec",
        "n_docs": N_DOCS,
        "corpus_mb": round(corpus_bytes / 1e6, 1),
        "parallelism": CPUS,
        "candidate_pairs": pairs,
        "cc": cc_stats,
        "queries": results,
    }
    print(json.dumps(payload))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/dedup-scale.md", "w") as fh:
        fh.write(
            "# BENCH — dedup family at 1M docs\n\n"
            f"Corpus: {N_DOCS:,} synthetic documents ({corpus_bytes/1e6:.0f} MB "
            "parquet, ~150 words/doc, 10% planted near-duplicates), "
            f"local[{CPUS}]. Same registry plans the driver correctness-checks "
            "at sf0.01 (`dedup_minhash_signature`, `dedup_lsh_bands`), "
            "min-of-samples protocol.\n\n"
            "| query | best sec | docs/sec | samples |\n|---|---|---|---|\n"
            + "".join(
                f"| {k} | {v['best_sec']} | {v['docs_per_sec_best']:,} | "
                f"{v['samples_sec']} |\n"
                for k, v in results.items()
            )
            + f"\nLSH candidate pairs found: {pairs:,}; connected components: "
            f"{cc_stats.get('docs_in_components', 0):,} docs collapse into "
            f"{cc_stats.get('n_components', 0):,} duplicate groups (full "
            "signatures → banding → Jaccard verify → iterative min-label "
            "propagation path).\n\n"
            "Scale shape: shingles explode once, all md5s run in whole-stage "
            "codegen, and a map-side-combined groupBy(doc_id) collapses the "
            "exchange to one slim row per doc (no Python anywhere); banding "
            "is explode + groupBy(band, bucket) — an equi-shuffle on the "
            "band hash, never an all-pairs product. At 10^12 docs the same "
            "plan shards by (band_idx, bucket) with AQE skew-split handling "
            "hot buckets.\n"
        )


if __name__ == "__main__":
    main()
