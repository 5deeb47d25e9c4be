"""Unit tests for the per-query sweep-time regression gate (round-4
verdict #1): the harness, not a human reading a log, must catch the next
super-linear plan regression."""

from __future__ import annotations

from scripts.check_sweep_regression import compare_sweeps


def _sweep(entries):
    return {
        "queries": {
            name: {"seconds": s, "status": status}
            for name, s, status in entries
        }
    }


def test_clean_sweep_flags_nothing():
    prev = _sweep([("a", 2.0, "ok"), ("b", 0.3, "ok")])
    cur = _sweep([("a", 2.4, "ok"), ("b", 0.5, "ok")])
    out = compare_sweeps(prev, cur)
    assert out["flagged"] == [] and out["ok"] == 2


def test_superlinear_regression_is_flagged():
    # the round-4 scenario: 17s → 526s (the hot-bucket quadratic)
    prev = _sweep([("neardup", 17.1, "ok")])
    cur = _sweep([("neardup", 525.9, "ok")])
    out = compare_sweeps(prev, cur, ratio=3.0)
    assert len(out["flagged"]) == 1
    f = out["flagged"][0]
    assert f["name"] == "neardup" and f["kind"] == "time_regression"
    assert f["ratio"] > 30


def test_subsecond_jitter_is_not_flagged():
    # 0.1s → 0.9s is 9x but under min_seconds: host noise, not a plan
    prev = _sweep([("tiny", 0.1, "ok")])
    cur = _sweep([("tiny", 0.9, "ok")])
    assert compare_sweeps(prev, cur, min_seconds=1.0)["flagged"] == []


def test_near_zero_baseline_uses_min_seconds_floor():
    # 0.2s → 1.5s: above min_seconds but only 2.25x the FLOORED baseline
    # (min_seconds/ratio = 0.333) → 1.5 > 3*0.333 = 1.0 → flagged; while
    # 0.5s → 1.2s stays under 3*0.5 → clean
    prev = _sweep([("a", 0.2, "ok"), ("b", 0.5, "ok")])
    cur = _sweep([("a", 1.5, "ok"), ("b", 1.2, "ok")])
    out = compare_sweeps(prev, cur, ratio=3.0, min_seconds=1.0)
    assert [f["name"] for f in out["flagged"]] == ["a"]


def test_status_regression_flagged_regardless_of_time():
    prev = _sweep([("q", 0.2, "ok")])
    cur = _sweep([("q", 0.1, "fail")])
    out = compare_sweeps(prev, cur)
    assert out["flagged"][0]["kind"] == "status_regression"


def test_new_query_reported_not_flagged():
    prev = _sweep([("old", 1.0, "ok")])
    cur = _sweep([("old", 1.1, "ok"), ("brand_new", 50.0, "ok")])
    out = compare_sweeps(prev, cur)
    assert out["flagged"] == [] and out["new"] == ["brand_new"]


def test_sweep_from_log_parses_ok_fail_and_appended_remeasures():
    from scripts.check_sweep_regression import sweep_from_log

    log = """# header comment
ok   pricing_summary: 6 rows match (0.4s)
FAIL broken_q: value-hash deadbeef != cafebabe
ok   neardup: 3 rows match (525.9s)
ok   neardup: 3 rows match (17.1s)
ok   rows_only_q: rows-only (10 rows, 2.0s) [no oracle]
"""
    out = sweep_from_log(log)
    q = out["queries"]
    assert q["pricing_summary"] == {"seconds": 0.4, "status": "ok"}
    assert q["broken_q"]["status"] == "fail"
    assert q["neardup"]["seconds"] == 17.1  # appended re-measure wins
    assert q["rows_only_q"]["seconds"] == 2.0


def test_missing_query_is_flagged():
    prev = _sweep([("kept", 1.0, "ok"), ("dropped", 9.0, "ok")])
    cur = _sweep([("kept", 1.0, "ok")])
    out = compare_sweeps(prev, cur)
    assert [f["kind"] for f in out["flagged"]] == ["missing_from_current"]
    assert out["flagged"][0]["name"] == "dropped"
