"""Merge-on-read delta-chain probe: characterize the MOR trade at scale.

The MOR write path is O(batch) by construction — this probe puts numbers
on BOTH sides of the trade as the pending chain grows:

  1. merge wall time vs chain length  — must stay FLAT (the whole point;
     a trend here means the write path secretly reads the base);
  2. read_table wall time vs chain length — the documented read tax: the
     resolve union adds one slim parquet read per pending commit plus a
     per-key window over delta'd buckets, so cost grows with chain
     length; the probe measures the slope;
  3. incremental compact (min_deltas) at the end — the mitigation: cost
     of materializing the chain, and the post-compact read returning to
     the COW baseline.

From slope + flat-line the probe derives a compact-every-K
recommendation and records it in the JSON (the steady-state
housekeeping cadence a 10^12-row deployment would schedule).

Env: MOR_PROBE_ROWS (default 500000), MOR_PROBE_MERGES (default 32),
MOR_PROBE_BATCH (default 500 rows/merge), MOR_PROBE_SPREAD
("all" = keys spread across every bucket, the adversarial
fastest-fragmentation shape; "hot" = keys confined to ~3 of 64 buckets, the
realistic upserts-keyed-to-recent-data shape — the read tax should then
be confined to the hot fraction while cold-bucket reads stay COW-fast,
which the probe verifies by ALSO timing a cold-bucket-only read),
SPARK_GRAFT_CPUS (default 32). Prints one JSON line; human-readable
summary in BENCH/mor-chain.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_ROWS = int(os.environ.get("MOR_PROBE_ROWS", "500000"))
N_MERGES = int(os.environ.get("MOR_PROBE_MERGES", "32"))
BATCH = int(os.environ.get("MOR_PROBE_BATCH", "500"))
SPREAD = os.environ.get("MOR_PROBE_SPREAD", "all")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BUCKETS = 64
READ_AT = sorted({0, 4, 8, 16, N_MERGES})


def main() -> int:
    from pyspark.sql import functions as F

    from wallaby2caom2_spark.session import get_spark
    from wallaby2caom2_spark.sources import snapshot_table as st

    spark = get_spark(cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="mor_chain_")
    path = os.path.join(work, "tbl")

    base = spark.range(N_ROWS).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("clip_id"),
        F.col("id").cast("int").alias("v"),
        F.sha1(F.col("id").cast("string").cast("binary")).alias("payload"),
    )
    t0 = time.time()
    st.create_table(spark, path, base, key="clip_id", n_buckets=N_BUCKETS)
    create_s = round(time.time() - t0, 3)

    def timed_read():
        spark.catalog.clearCache()
        t = time.time()
        n = st.read_table(spark, path).count()
        return round(time.time() - t, 3), n

    def timed_cold_read():
        """Read 4 provably-cold buckets only — in the hot spread these
        never gain deltas, so their read must stay COW-flat no matter
        how long the hot chains grow (the confinement claim, timed)."""
        spark.catalog.clearCache()
        m = st.read_manifest(path)
        cold = [b for b in range(N_BUCKETS - 4, N_BUCKETS)]
        t = time.time()
        st._read_buckets(spark, path, m, cold).count()
        return round(time.time() - t, 3)

    hot_pool: list[str] = []
    if SPREAD == "hot":
        from wallaby2caom2_spark.operators.partitioning import with_bucket

        hot_pool = [
            r["clip_id"]
            for r in with_bucket(
                base.select("clip_id"), N_BUCKETS, key="clip_id"
            )
            .filter(F.col("bucket") < 3)
            .limit(BATCH * N_MERGES)
            .collect()
        ]
        assert len(hot_pool) >= BATCH * N_MERGES, (
            "hot pool too small — raise MOR_PROBE_ROWS"
        )

    merges, reads, cold_reads = [], {}, {}
    reads[0] = timed_read()
    cold_reads[0] = timed_cold_read()
    rng_base = 0
    for i in range(1, N_MERGES + 1):
        if SPREAD == "hot":
            keys = hot_pool[(i - 1) * BATCH : i * BATCH]
            upd = spark.createDataFrame(
                [(k, 1_000_000 + i) for k in keys], "clip_id string, v int"
            ).select(
                "clip_id",
                "v",
                F.sha1(F.col("clip_id").cast("binary")).alias("payload"),
            )
        else:
            # deterministic pseudo-random keys: spread across buckets
            upd = spark.range(rng_base, rng_base + BATCH).select(
                F.concat(
                    F.lit("k"),
                    ((F.col("id") * 2654435761) % N_ROWS).cast("string"),
                ).alias("clip_id"),
                F.lit(1_000_000 + i).cast("int").alias("v"),
                F.sha1(F.col("id").cast("string").cast("binary")).alias(
                    "payload"
                ),
            )
        rng_base += BATCH
        t = time.time()
        st.merge(spark, path, upd, mode="mor")
        merges.append(round(time.time() - t, 3))
        if i in READ_AT:
            reads[i] = timed_read()
            cold_reads[i] = timed_cold_read()

    m = st.read_manifest(path)
    max_chain = max(len(v) for v in m.get("deltas", {}).values())
    t = time.time()
    comp = st.compact(spark, path, min_deltas=1)
    compact_s = round(time.time() - t, 3)
    read_after = timed_read()

    merge_first4 = sum(merges[:4]) / 4
    merge_last4 = sum(merges[-4:]) / 4
    read_slope = (
        (reads[N_MERGES][0] - reads[0][0]) / N_MERGES if N_MERGES else 0.0
    )
    # recommend compacting before the read tax doubles the COW read
    rec_k = (
        max(4, int(reads[0][0] / read_slope)) if read_slope > 0 else None
    )
    out = {
        "metric": "mor_chain_probe",
        "spread": SPREAD,
        "rows": N_ROWS,
        "n_buckets": N_BUCKETS,
        "merges": N_MERGES,
        "batch_rows": BATCH,
        "cold_read_s_by_chain": {
            str(k): v for k, v in cold_reads.items()
        },
        "create_s": create_s,
        "merge_s_first4_avg": round(merge_first4, 3),
        "merge_s_last4_avg": round(merge_last4, 3),
        "merge_flat_ratio": round(merge_last4 / merge_first4, 3),
        "read_s_by_chain": {str(k): v[0] for k, v in reads.items()},
        "read_rows": reads[N_MERGES][1],
        "read_slope_s_per_delta": round(read_slope, 4),
        "max_bucket_chain": max_chain,
        "compact_s": compact_s,
        "read_s_after_compact": read_after[0],
        "compact_every_k_recommendation": rec_k,
        "cpus": CPUS,
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
