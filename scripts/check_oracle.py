"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified). Exit code 1 on any
mismatch.

Usage: python scripts/check_oracle.py [--json-out PATH] [name ...]

``--json-out`` additionally writes a machine-readable per-query record
``{"sf_dir", "queries": {name: {"seconds", "status"}}}`` — the input of
``scripts/check_sweep_regression.py``, which flags any query whose wall
time grew super-linearly vs a previous sweep (round-4 verdict #1: the
hot-bucket quadratic was caught by a human reading a log; the next one
should be caught by the harness).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from wallaby2caom2_spark.session import get_spark  # noqa: E402


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x02")
    return h.hexdigest()[:16]


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json-out" in args:
        i = args.index("--json-out")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    session_chunk = 0
    if "--session-chunk" in args:
        i = args.index("--session-chunk")
        session_chunk = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    only = set(args)
    record: dict[str, dict] = {}
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        # a typo'd name silently filtering EVERYTHING out would print
        # "0 failures" having checked nothing — fail loudly instead
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        return 2
    if SF_DIR != "/root/testdata/sf0.01":
        # the entry contract bakes the clips-fixture oracle paths at the
        # driver's comparison scale (sf0.01); re-derive EVERY clips oracle
        # for local runs at other scales so both engines read the same cache
        from wallaby2caom2_spark.queries import ALL_ORACLE_BUILDERS

        for name, build in ALL_ORACLE_BUILDERS.items():
            oracles[name] = build(SF_DIR)
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    failures = []
    n_run = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if session_chunk and n_run and n_run % session_chunk == 0:
            # full-sweep JVM hygiene: a single driver running 180+
            # unrelated jobs back-to-back accumulates JVM state (codegen
            # classes, listener/broadcast bookkeeping) until a later
            # query's peak tips a heap that the same query clears easily
            # in a fresh session (observed twice at sf0.1). Recycling the
            # session every N queries bounds that accumulation without
            # relaxing any per-query check — ops hygiene a real cluster
            # gets for free from per-job drivers.
            spark.stop()
            spark = get_spark("check_oracle")
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            # sweep hygiene: queries may persist intermediates for their
            # own multi-leg reads; on a shared 182-query session those
            # caches accumulate and starve later queries (observed: 12g
            # driver OOM at sf0.1 right after the persist-heavy MT pair)
            spark.catalog.clearCache()
            del sdf
            # py4j holds JVM-side plan objects (the MT queries embed
            # 4x8x24 literal-array plane constants per branch) until
            # PYTHON gc runs and sends the detach; force it per query so
            # dead plans cannot pile up on the driver heap
            import gc

            gc.collect()
        except Exception as e:  # noqa: BLE001
            try:
                spark.catalog.clearCache()
            except Exception:  # a dead context must not mask the error
                pass
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            record[name] = {"seconds": round(time.time() - t0, 3), "status": "fail"}
            continue
        # the regression gate times the SPARK side only (oracle replay
        # time is DuckDB's business, not a plan-shape signal)
        spark_secs = round(time.time() - t0, 3)
        if name not in oracles:
            print(
                f"ok   {name}: rows-only ({len(srows)} rows, "
                f"{spark_secs:.1f}s) [no oracle]"
            )
            record[name] = {"seconds": spark_secs, "status": "ok"}
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            record[name] = {"seconds": spark_secs, "status": "fail"}
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows spark={len(srows)} oracle={len(orows)}")
        if not problems:
            hs = value_hash(scols, srows)
            ho = value_hash(ocols, orows)
            if hs != ho:
                problems.append(f"value-hash {hs} != {ho}")
        record[name] = {
            "seconds": spark_secs,
            "status": "fail" if problems else "ok",
        }
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(
                f"ok   {name}: {len(srows)} rows match "
                f"({spark_secs:.1f}s)"
            )
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(
                {"sf_dir": SF_DIR, "queries": record}, fh, indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_out} ({len(record)} queries)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
