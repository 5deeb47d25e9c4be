"""Driver-contract query registry.

Each submodule exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLE`` (name → DuckDB SQL over the pre-registered views
``region nation customer supplier part orders lineitem events documents
embeddings``). Names without an ORACLE entry get the driver's weaker
rows-only check (non-SQL-expressible ops: the binary clips pipeline).

Contract: every computed column is aliased identically in the Spark plan and
the oracle SQL; floating aggregates are rounded in BOTH so value-hashes match.
"""

from __future__ import annotations

from . import (
    analytics,
    audio_embed,
    clips_flagship,
    corpus,
    curation,
    dedup,
    lakehouse,
    nested,
    relational,
    retrieval,
    shards,
    similarity,
    streaming,
    textstats,
)

_MODULES = (
    relational,
    nested,
    analytics,
    dedup,
    similarity,
    textstats,
    corpus,
    curation,
    retrieval,
    streaming,
    clips_flagship,
    shards,
    audio_embed,
    lakehouse,
)

ALL_QUERIES = {}
ALL_ORACLE = {}
# sf-dependent oracles (fixture paths baked at call time): modules expose
# ORACLE_BUILDERS (name → callable(sf_dir) → SQL) next to static ORACLE
ALL_ORACLE_BUILDERS = {}
for _m in _MODULES:
    for _k in _m.QUERIES:
        if _k in ALL_QUERIES:
            raise ValueError(f"duplicate query name {_k}")
    ALL_QUERIES.update(_m.QUERIES)
    ALL_ORACLE.update(_m.ORACLE)
    for _k in getattr(_m, "ORACLE_BUILDERS", {}):
        if _k in ALL_ORACLE_BUILDERS or _k in ALL_ORACLE:
            raise ValueError(f"duplicate oracle for {_k}")
    ALL_ORACLE_BUILDERS.update(getattr(_m, "ORACLE_BUILDERS", {}))
