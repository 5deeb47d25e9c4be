"""Keyed merge/upsert into a partitioned parquet results table.

Reference analog (J2/S8): read the existing observation record, augment it,
write it back (``wallaby2caom2/tests/test_caom_gen_visit.py:109-117``,
``_caom2_read`` → ``_caom2_store``). On Iceberg this is literally
``MERGE INTO target USING updates ON t.clip_id = s.clip_id``; the runtime
here has no Iceberg jars, so this module implements the same semantics on a
bucket-partitioned parquet table:

    1. bucket the updates by the deterministic clip_id hash;
    2. read ONLY the target partitions those buckets touch (partition
       pruning — untouched buckets are never read or rewritten);
    3. latest-wins dedup inside each touched bucket;
    4. dynamic-partition-overwrite the touched buckets atomically-enough
       (same idempotence contract as the wave runner).

At 10^12 rows the touched-bucket read is the whole trick: a 0.1% update
batch rewrites 0.1% of partitions, not the table.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.clips import _is_schemaless_read
from .partitioning import with_bucket


# catalog providers whose tables support true row-level MERGE INTO; plain
# parquet/csv catalog tables do not (Spark needs a v2 row-level-op source)
_MERGE_PROVIDERS = frozenset(["iceberg", "delta"])


def supports_merge_into(spark: SparkSession, table: str) -> bool:
    """True when ``table`` exists in the catalog AND its provider supports
    SQL MERGE INTO. This container carries no Iceberg/Delta jar, so here it
    is always False — but the dispatch below is what a lakehouse deployment
    flips on by just adding the jar + catalog conf (no code change)."""
    try:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    except Exception:
        return False
    provider = next(
        (r["data_type"] for r in rows if r["col_name"] == "Provider"), ""
    )
    return (provider or "").strip().lower() in _MERGE_PROVIDERS


def _dedup_updates(
    updates: DataFrame, key: str, order_col: str | None
) -> DataFrame:
    """Collapse intra-batch duplicate keys deterministically (MERGE INTO
    *requires* a unique source per target row — multiple matches raise at
    runtime on every engine). Same winner rule as the parquet fallback:
    highest ``order_col``, content-hash tiebreak."""
    from pyspark.sql import types as T

    hashable = [
        f.name
        for f in updates.schema.fields
        if not isinstance(f.dataType, T.MapType)
    ]
    content_hash = F.xxhash64(*[F.col(c) for c in hashable])
    order = (
        [F.col(order_col).desc_nulls_last()] if order_col else []
    ) + [content_hash.desc()]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def build_merge_sql(
    target_table: str,
    source_view: str,
    key: str,
    delete_where: str | None = None,
) -> str:
    """The MERGE statement the lakehouse path runs — latest-wins upsert,
    identical semantics to the parquet fallback's window resolution.
    ``delete_where`` (a SQL predicate over the SOURCE row ``s``) adds the
    ``WHEN MATCHED AND cond THEN DELETE`` arm and gates the insert arm so
    an unmatched delete marker is a no-op — matching
    ``snapshot_table.merge``'s delete semantics."""
    if delete_where is None:
        return (
            f"MERGE INTO {target_table} t USING {source_view} s "
            f"ON t.{key} = s.{key} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    return (
        f"MERGE INTO {target_table} t USING {source_view} s "
        f"ON t.{key} = s.{key} "
        f"WHEN MATCHED AND ({delete_where}) THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        f"WHEN NOT MATCHED AND NOT coalesce(({delete_where}), false) "
        "THEN INSERT *"
    )


def _run_merge_into(
    spark: SparkSession,
    target_table: str,
    updates: DataFrame,
    key: str,
    delete_where: str | None = None,
) -> dict:
    """Execute the real MERGE (only reachable when supports_merge_into)."""
    view = f"_upsert_src_{abs(hash(target_table)) % 10_000}"
    updates.createOrReplaceTempView(view)
    try:
        spark.sql(build_merge_sql(target_table, view, key, delete_where))
    finally:
        spark.catalog.dropTempView(view)
    return {"engine": "merge_into", "table": target_table}


def merge_upsert_auto(
    spark: SparkSession,
    target: str,
    updates: DataFrame,
    key: str = "clip_id",
    n_buckets: int = 16,
    order_col: str | None = None,
    delete_where: str | None = None,
    write_mode: str = "cow",
) -> dict:
    """Gated dispatch (J2): a catalog table with a MERGE-capable provider
    gets true ``MERGE INTO``; a path holding a snapshot table
    (sources/snapshot_table.py) gets the REAL copy-on-write merge commit
    — executed end-to-end in tests, no mocks (tests/test_snapshot_merge.py);
    any other path gets the bucket-partitioned overwrite stand-in with
    the same latest-wins semantics. ``target`` is a table name when it
    contains no path separator and the provider probe succeeds.

    ``delete_where`` (SQL predicate over the update row) enables the
    MATCHED-DELETE arm on the MERGE INTO and snapshot paths; the plain
    partition-overwrite stand-in has no row-deletion story (it only
    rewrites whole buckets from resolved rows), so it refuses rather
    than silently keeping rows marked for deletion.

    ``write_mode`` ("cow" | "mor") selects the snapshot table's write
    path — copy-on-write bucket rewrite vs O(batch) merge-on-read delta
    append (``snapshot_table.merge``). A real-catalog ``MERGE INTO``
    target picks its own strategy from table properties (e.g. Iceberg's
    ``write.merge.mode``), so write_mode is ignored there; the
    partition-overwrite stand-in is COW by construction and refuses
    "mor" rather than silently rewriting buckets."""
    if "/" not in target and supports_merge_into(spark, target):
        deduped = _dedup_updates(updates, key, order_col)
        out = _run_merge_into(spark, target, deduped, key, delete_where)
        return out
    from ..sources import snapshot_table

    if snapshot_table.is_snapshot_table(target):
        out = snapshot_table.merge(
            spark, target, updates, order_col=order_col,
            delete_where=delete_where, mode=write_mode,
        )
        out["engine"] = "snapshot_merge"
        return out
    if write_mode != "cow":
        raise ValueError(
            "write_mode='mor' requires a snapshot table (the "
            "partition-overwrite stand-in has no delta-file story)"
        )
    if delete_where is not None:
        raise ValueError(
            "delete_where requires a snapshot table or a MERGE-capable "
            "catalog table; the partition-overwrite stand-in cannot "
            "delete rows"
        )
    out = merge_upsert(
        spark, target, updates, key=key, n_buckets=n_buckets,
        order_col=order_col,
    )
    out["engine"] = "partition_overwrite"
    return out


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str = "clip_id",
    n_buckets: int = 16,
    order_col: str | None = None,
) -> dict:
    """Upsert ``updates`` into the bucket-partitioned table at target_path.

    ``order_col`` (e.g. an mtime/sequence column) picks the winner when one
    batch carries several rows per key — highest value wins; residual ties
    (and the no-``order_col`` case) break on a content hash so re-runs pick
    the same row deterministically.

    Returns {"touched_buckets": [...], "updated": n, "inserted": n} with
    counts over DISTINCT keys (intra-batch duplicates collapse first).
    """
    upd = with_bucket(updates, n_buckets, key=key)
    # collapse intra-batch duplicate keys deterministically before counting.
    # Hash only hashable columns: xxhash64 rejects MapType at analysis time
    # (the same hazard partitioning._contains_unsaltable guards), so map
    # columns are excluded from the tie-break identity — acceptable, since
    # the hash only orders residual ties among rows ALREADY equal on
    # order_col, and any non-map column difference still separates them.
    from pyspark.sql import types as T

    hashable = [
        f.name
        for f in updates.schema.fields
        if not isinstance(f.dataType, T.MapType)
    ]
    content_hash = F.xxhash64(*[F.col(c) for c in hashable])
    order = (
        [F.col(order_col).desc_nulls_last()] if order_col else []
    ) + [content_hash.desc()]
    w_upd = Window.partitionBy(key).orderBy(*order)
    upd = (
        upd.withColumn("_rn", F.row_number().over(w_upd))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("_is_update", F.lit(True))
    )
    # materialize ONCE: the deduped updates (and the caller's whole upstream
    # plan under them) feed three actions below (touched-bucket collect, the
    # merged checkpoint, the key count) — without this the upstream pipeline
    # would execute three times per upsert
    upd = upd.localCheckpoint(eager=True)
    touched = [int(r["bucket"]) for r in upd.select("bucket").distinct().collect()]

    try:
        target = spark.read.parquet(target_path)
        existing = target.filter(F.col("bucket").isin(touched)).withColumn(
            "_is_update", F.lit(False)
        )
    except AnalysisException as e:
        # bootstrap: no table at target_path yet — every update row inserts
        # (Iceberg MERGE's WHEN NOT MATCHED THEN INSERT on an empty table).
        # ONLY the missing-path/no-footers case: treating a transient read
        # failure as bootstrap would dynamic-overwrite the touched buckets
        # with update rows alone, silently deleting every existing
        # non-updated key in them.
        if not _is_schemaless_read(e):
            raise
        existing = upd.filter(F.lit(False)).withColumn("_is_update", F.lit(False))

    n_before = existing.count()
    merged = existing.unionByName(upd)
    # latest-wins: the (now unique) update row shadows the existing row
    w = Window.partitionBy(key).orderBy(F.col("_is_update").desc())
    resolved = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_update")
    )
    # break lineage to the files being replaced: the merged plan reads the
    # very partitions the write below overwrites (and the caller's updates
    # may lazily derive from the target too) — localCheckpoint materializes
    # the result so the overwrite never races its own input
    resolved = resolved.localCheckpoint(eager=True)
    n_after = resolved.count()
    n_update_keys = upd.count()
    inserted = n_after - n_before

    (
        resolved.write.mode("overwrite")
        # per-write, not session-level: under the default STATIC mode an
        # externally-built session would truncate every untouched bucket
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(target_path)
    )
    spark.catalog.refreshByPath(target_path)
    return {
        "touched_buckets": sorted(touched),
        "updated": n_update_keys - inserted,
        "inserted": inserted,
    }
