"""Sources & sinks: clips table IO, snapshot checkpoint, lineage/metrics.

Iceberg is the production target (BASELINE.json north_star); its runtime jar
is not in this container, so the storage layer is written against a small
interface with two backends: Iceberg (gated behind a catalog probe) and
plain Parquet + a JSON snapshot-manifest control file that reproduces the
pieces the pipeline relies on — snapshot ids for incremental reads and
idempotent partition overwrite for exactly-once resume.
"""
