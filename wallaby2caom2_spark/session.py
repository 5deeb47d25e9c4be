"""SparkSession factory with the pipeline's pinned configuration.

Local-mode defaults sized for the sandbox (local[$SPARK_GRAFT_CPUS]); on a
real cluster the same builder options apply, only master/memory change
(launched via ``spark-submit --py-files``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import DEFAULT_CONFIG


def get_spark(
    app_name: str = "wallaby2caom2_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # Under spark-submit the JVM gateway is already running with the
    # submitted --master (local-cluster / standalone / yarn / k8s); the
    # local[N] sandbox default must NOT override it, or a cluster launch
    # silently collapses back into the driver JVM.
    submitted = "PYSPARK_GATEWAY_PORT" in os.environ
    if cpus is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus_env}]" if cpus_env else "local[*]"
    else:
        master = f"local[{cpus}]"
    shuffle = shuffle_partitions or DEFAULT_CONFIG.shuffle_partitions
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
    # Shuffle spill dir: tmpfs by default. On a real cluster each executor
    # shuffles to its own local NVMe (scales with nodes); in this single-VM
    # proxy the lone /tmp disk would be an artificial serial resource.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    os.makedirs(local_dir, exist_ok=True)
    builder = (
        SparkSession.builder if submitted
        else SparkSession.builder.master(master)
    )
    return (
        builder
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(DEFAULT_CONFIG.arrow_max_records_per_batch),
        )
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Split size balances decode parallelism against per-task overhead:
        # 64 MB makes each ~60 MB clips file exactly ONE scan task (80
        # balanced tasks at sf0.1 for 32 cores), measured ~16% faster than
        # 32 MB on the flagship (interleaved min-of-4: 2.64s vs 3.15s;
        # 128 MB packs two files per task and was only marginally faster
        # with a lumpier final wave). Per-task memory is governed by
        # columnarReaderBatchSize, not split size, so the heap math below
        # is unchanged.
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        # Binary-column scan safety: the default 4096-row columnar batch
        # materializes ~200 MB of on-heap OnHeapColumnVector per in-flight
        # task when `bytes` averages ~50 KB; at 32 concurrent scan tasks
        # that alone exceeds the pinned heap (round-1 driver bench OOM).
        # 256 rows ≈ 13 MB/task keeps the whole scan wave under ~0.5 GB and
        # matches the Arrow transfer batch (arrow_max_records_per_batch=256;
        # the 1:1 alignment avoids cross-batch row buffering in the
        # JVM→Arrow writer — measured ~15% on the flagship).
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        # Same hazard on the vectorized Arrow/pandas conversion path.
        .config("spark.sql.inMemoryColumnarStorage.batchSize", "1024")
        # idempotent re-runs overwrite only the partitions they recompute
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", driver_mem)
        .config("spark.local.dir", local_dir)
        # Pin + pre-touch the heap: on this virtualized host, G1's grow/
        # uncommit cycles caused page-fault storms (40%+ kernel time, 10x
        # slowdowns) as released pages were reclaimed by the hypervisor and
        # re-faulted on the next query. -Xms=-Xmx + AlwaysPreTouch keeps the
        # heap resident; scan times dropped from ~30-80s to ~4s at 4.3GB.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{driver_mem} -XX:+AlwaysPreTouch",
        )
        .getOrCreate()
    )


def executor_jvm_count(spark: SparkSession) -> int | None:
    """How many separate executor JVMs served this session — 0 in local[N]
    single-JVM mode, N on a real / local-cluster deployment.

    Uses the one JVM endpoint the public API doesn't expose (block-manager
    registry size minus the driver's own endpoint); returns None instead of
    raising if the private accessor drifts across Spark versions, so both
    the job-summary and bench consumers degrade to "unknown", never crash
    mid-run.
    """
    try:
        endpoints = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
        return max(0, int(endpoints) - 1)
    except Exception:  # pragma: no cover - private API drift
        return None
