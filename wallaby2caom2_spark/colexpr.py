"""Column-expression helpers shared across query and streaming layers.

Lives outside ``queries/`` so ``streaming/`` can import it without pulling
in the query-registry package ``__init__`` (which itself imports the
streaming modules — a cycle otherwise).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def cents(col: F.Column) -> F.Column:
    """Exact money representation: deterministic per-row double→cents.

    Rounding BEFORE any sum is the registry-wide convention — integer
    addition is associative, so aggregates are independent of partition
    count and merge order, and the DuckDB oracles replay the same rule as
    ``round(x*100, 0)::BIGINT``. Rounding after a double sum would let
    float accumulation order leak into the last cent.
    """
    return F.round(col * 100, 0).cast("bigint")
