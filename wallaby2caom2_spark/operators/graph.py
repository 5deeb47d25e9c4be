"""Distributed connected components — iterative min-label propagation.

The ONE implementation of the CC shape both dedup survivor election
(queries/dedup.py) and the leakage-free group split
(queries/clips_flagship.py) run: each round is one equi-join (edges ⋈
labels) + partial-agg min, labels ``localCheckpoint``-ed per round so the
lineage (and thus the plan) stays O(1) deep instead of O(iters); on a real
cluster this is ``spark.sparkContext.setCheckpointDir`` + ``checkpoint``.
Converges in O(graph diameter) rounds — near-dup components are shallow
(dozens of members), so the default cap is generous; the driver-side
convergence probe is one tiny count per round, the accepted pattern for
iterative algorithms (not a per-row collect). Non-convergence FAILS LOUDLY:
silent truncation would return SPLIT components (labels one hop short on
any chain deeper than the cap) while the DuckDB oracles compute the exact
``WITH RECURSIVE`` closure.

Reference analog: the plane re-homing regroup J1
(``fix_product_id_visit.py:80-107``) — records re-keyed to a canonical
group id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CC_MAX_ITERS = 15


def min_label_components(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    id_col: str,
    max_iters: int = CC_MAX_ITERS,
) -> DataFrame:
    """Undirected pair frame (``a_col``, ``b_col``) → one ``(id_col,
    component)`` row per id that appears in any edge; ``component`` = min
    id reachable through the pair graph (including itself). Ids with no
    edge do not appear — callers coalesce to the id itself."""
    pairs = pairs.select(a_col, b_col)
    edges = (
        pairs.union(pairs.select(F.col(b_col), F.col(a_col)))
        .toDF("src", "dst")
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias(id_col))
        .distinct()
        .withColumn("component", F.col(id_col))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col(id_col).alias("dst"),
                    F.col("component").alias("dst_comp"),
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_comp").alias("nbr_min"))
        )
        new_labels = (
            labels.join(
                nbr_min.select(F.col("src").alias(id_col), "nbr_min"),
                id_col,
                "left",
            )
            .select(
                id_col,
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), id_col)
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_iters} "
            "rounds — component diameter exceeds the cap; raise max_iters"
        )
    edges.unpersist()
    return labels.select(id_col, "component")
