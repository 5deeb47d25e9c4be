"""Video frame-sampling operator tests: RVID parsing, per-frame stats,
error containment, hostile-header bounds, and datagen determinism.

Golden-comparison style of the reference's expected/actual fixture tests
(``wallaby2caom2/tests/test_caom_gen_visit.py``): the worker's output is
checked against independently computed numpy truth, not against itself.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from wallaby2caom2_spark import datagen
from wallaby2caom2_spark.operators.video import (
    _HEADER_LEN,
    _MAX_TOTAL_PX,
    _parse_rvid,
    frame_sample_stats,
)


def _rvid(w, h, fps, declared, frames: list[bytes]) -> bytes:
    return (
        b"RVID"
        + struct.pack(">HHHI", w, h, fps, declared)
        + b"".join(frames)
    )


def test_parse_valid_and_truncated():
    frames = [bytes(range(6)) for _ in range(4)]  # 3x2 frames
    assert _parse_rvid(_rvid(3, 2, 25, 4, frames)) == (3, 2, 25, 4, 4)
    # declared 6, only 4 full planes present
    assert _parse_rvid(_rvid(3, 2, 25, 6, frames)) == (3, 2, 25, 6, 4)
    # a partial trailing plane does not count
    assert _parse_rvid(_rvid(3, 2, 25, 6, frames) + b"\x01\x02") == (
        3, 2, 25, 6, 4,
    )


def test_parse_rejects_and_bounds():
    assert _parse_rvid(b"") is None
    assert _parse_rvid(b"RVI") is None
    assert _parse_rvid(b"XVID" + b"\x00" * 10) is None
    # zero-area geometry: header fact, zero frames
    assert _parse_rvid(_rvid(0, 24, 25, 4, [])) == (0, 24, 25, 4, 0)
    # hostile header: huge w*h*declared must yield avail=0, no allocation
    w, h = 60_000, 60_000
    assert w * h > _MAX_TOTAL_PX
    assert _parse_rvid(_rvid(w, h, 25, 1000, [])) == (w, h, 25, 1000, 0)


def test_frame_stats_match_numpy(spark):
    rng = np.random.default_rng(5)
    w, h, n = 8, 5, 7
    planes = [rng.integers(0, 256, w * h, dtype=np.uint8) for _ in range(n)]
    rows = [
        ("ok", _rvid(w, h, 30, n, [p.tobytes() for p in planes])),
        ("trunc", _rvid(w, h, 30, n + 2, [p.tobytes() for p in planes])),
        ("zero", _rvid(0, 5, 30, 3, [])),
        ("empty", b""),
        ("garbage", b"GARBAGE!" * 4),
    ]
    df = spark.createDataFrame(rows, ["clip_id", "bytes"])
    got = {
        (r["clip_id"], r["frame_idx"]): r.asDict()
        for r in frame_sample_stats(df, every_k=3).collect()
    }
    # empty/garbage rows never reach the worker (magic prefilter)
    assert {k[0] for k in got} == {"ok", "trunc", "zero"}
    # sampled frames 0, 3, 6 of the valid row, exact numpy truth
    for f in (0, 3, 6):
        row = got[("ok", f)]
        assert row["decode_ok"] is True
        assert row["frames_avail"] == n and row["n_frames"] == n
        assert row["px_sum"] == int(planes[f].astype(np.int64).sum())
        assert row["px_min"] == int(planes[f].min())
        assert row["px_max"] == int(planes[f].max())
        assert row["px_mean"] == round(
            row["px_sum"] / (w * h) + 1e-9, 6
        )
    # truncated: same available frames, flagged not-ok
    assert got[("trunc", 0)]["decode_ok"] is False
    assert got[("trunc", 0)]["frames_avail"] == n
    assert got[("trunc", 0)]["n_frames"] == n + 2
    assert got[("trunc", 0)]["px_sum"] == int(planes[0].astype(np.int64).sum())
    # zero-geometry: exactly one row, NULL frame fields
    zero = got[("zero", None)]
    assert zero["decode_ok"] is False and zero["frames_avail"] == 0
    assert zero["px_sum"] is None and zero["px_mean"] is None


def test_frame_stats_rejects_bad_every_k(spark):
    df = spark.createDataFrame([("a", b"")], ["clip_id", "bytes"])
    with pytest.raises(ValueError):
        frame_sample_stats(df, every_k=0)


def test_video_rows_deterministic_and_branch_covered():
    a = datagen.generate_video_rows(40, seed=42)
    b = datagen.generate_video_rows(40, seed=42)
    assert a == b
    parsed = [_parse_rvid(r["bytes"]) for r in a]
    # empty payloads (roll 9) fail the parse; zero-width (roll 8) parses
    # with avail 0; truncated (roll 7) parses short; the rest are clean
    assert sum(p is None for p in parsed) == 4
    assert sum(p is not None and p[0] == 0 for p in parsed) == 4
    truncated = [p for p in parsed if p is not None and 0 < p[4] < p[3]]
    assert len(truncated) == 4
    clean = [p for p in parsed if p is not None and p[3] == p[4] > 0]
    assert len(clean) == 28
    # header length matches the documented layout
    r0 = next(r for r, p in zip(a, parsed) if p is not None and p[4] > 0)
    p0 = _parse_rvid(r0["bytes"])
    assert len(r0["bytes"]) == _HEADER_LEN + p0[0] * p0[1] * p0[4]
