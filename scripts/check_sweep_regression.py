"""Per-query sweep-time regression gate (round-4 verdict #1).

Compares two machine-readable sweep records produced by
``scripts/check_oracle.py --json-out`` and flags any query whose wall
time grew more than ``ratio``× versus the previous sweep — the signature
of a plan regression going super-linear (the round-4 embedding-LSH
hot-bucket quadratic was caught by a human reading a log; this makes the
harness catch the next one).

Rules:

- only queries ABOVE ``min_seconds`` in the CURRENT sweep are judged
  (sub-second jitter on a busy host is noise, not a plan shape);
- a query that regressed from ok→fail is flagged regardless of time;
- queries new in the current sweep are reported informationally, never
  flagged (there is no baseline);
- queries that DISAPPEARED from the current sweep are flagged — a
  silently dropped query would otherwise hide its regression forever.

Usage:
    python scripts/check_sweep_regression.py PREV.json CUR.json \
        [--ratio 3.0] [--min-seconds 1.0]

Exit 1 when anything is flagged.
"""

from __future__ import annotations

import json
import sys


def compare_sweeps(
    prev: dict,
    cur: dict,
    ratio: float = 3.0,
    min_seconds: float = 1.0,
) -> dict:
    """Return {"flagged": [...], "new": [...], "ok": n_compared}.

    ``prev``/``cur`` are the ``--json-out`` payloads
    (``{"queries": {name: {"seconds", "status"}}}``).
    """
    pq = prev.get("queries", {})
    cq = cur.get("queries", {})
    flagged: list[dict] = []
    new: list[str] = []
    compared = 0
    for name, rec in sorted(cq.items()):
        if name not in pq:
            new.append(name)
            continue
        compared += 1
        prev_rec = pq[name]
        if rec.get("status") == "fail" and prev_rec.get("status") == "ok":
            flagged.append(
                {
                    "name": name,
                    "kind": "status_regression",
                    "prev_seconds": prev_rec.get("seconds"),
                    "cur_seconds": rec.get("seconds"),
                }
            )
            continue
        ps, cs = prev_rec.get("seconds"), rec.get("seconds")
        if ps is None or cs is None or cs < min_seconds:
            continue
        # max(ps, epsilon): a near-zero previous time would make ANY
        # real work look like a regression; floor it at min_seconds so
        # the judgment is "grew past min_seconds AND past ratio×prev"
        if cs > ratio * max(ps, min_seconds / ratio):
            flagged.append(
                {
                    "name": name,
                    "kind": "time_regression",
                    "prev_seconds": ps,
                    "cur_seconds": cs,
                    "ratio": round(cs / max(ps, 1e-9), 2),
                }
            )
    for name in sorted(set(pq) - set(cq)):
        flagged.append({"name": name, "kind": "missing_from_current"})
    return {"flagged": flagged, "new": new, "ok": compared}


def sweep_from_log(text: str) -> dict:
    """Convert a human-readable sweep log (``ok   name: ... (X.Xs)`` /
    ``FAIL name: ...`` lines, as committed in docs/sweep_*.log) into the
    ``--json-out`` payload shape, so historical logs can serve as
    regression baselines. Later lines win (the committed logs append
    re-measure lines after fixes)."""
    import re

    queries: dict[str, dict] = {}
    # matches both "(3.6s)" and the rows-only form "(10 rows, 2.0s)"
    ok_re = re.compile(r"^ok\s+([\w.]+):.*[\s(]([0-9.]+)s\)")
    fail_re = re.compile(r"^FAIL\s+([\w.]+):")
    for line in text.splitlines():
        m = ok_re.match(line)
        if m:
            queries[m.group(1)] = {
                "seconds": float(m.group(2)),
                "status": "ok",
            }
            continue
        m = fail_re.match(line)
        if m:
            queries[m.group(1)] = {"seconds": None, "status": "fail"}
    return {"queries": queries}


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("prev")
    ap.add_argument("cur")
    ap.add_argument("--ratio", type=float, default=3.0)
    ap.add_argument("--min-seconds", type=float, default=1.0)
    ns = ap.parse_args()

    def _load(p: str) -> dict:
        with open(p) as fh:
            if p.endswith(".log"):
                return sweep_from_log(fh.read())
            return json.load(fh)

    prev = _load(ns.prev)
    cur = _load(ns.cur)
    out = compare_sweeps(prev, cur, ratio=ns.ratio, min_seconds=ns.min_seconds)
    for f in out["flagged"]:
        print(f"FLAG {json.dumps(f, sort_keys=True)}")
    if out["new"]:
        print(f"new queries (no baseline): {out['new']}")
    print(
        f"{len(out['flagged'])} flagged / {out['ok']} compared "
        f"(ratio>{ns.ratio}, min {ns.min_seconds}s)"
    )
    return 1 if out["flagged"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
