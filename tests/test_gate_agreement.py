"""Gate-agreement kappa matrix (queries/clips_flagship.py::gate_agreement):
planted clips give exact contingency counts, a hand-computed kappa, and the
degenerate (nothing-fires) branch."""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.queries.clips_flagship import gate_agreement

SR = 16000


def _clips(spark, rows):
    return spark.createDataFrame(
        [
            (cid, bytearray(audio.encode_wav(sig, SR)), SR, 1000, "wav", "")
            for cid, sig in rows
        ],
        schema=(
            "clip_id string, bytes binary, sr_hz int, dur_ms int, "
            "codec string, transcript string"
        ),
    )


def _quiet(rng, n):
    # 2-3 LSB random noise: rms ≈ 8e-5 < the 1e-4 silence floor AND no
    # speech frames — but never a hard-zero sample, so the dropout gate
    # (longest zero run) must NOT fire on it
    lsb = rng.uniform(2.2, 3.2, n) * np.where(rng.random(n) < 0.5, -1, 1)
    return (lsb / 32767.0).astype(np.float32)


def _planted(spark):
    rng = np.random.default_rng(7)
    n = SR  # 1 s
    # quiet: rms < 1e-4 (silence gate) AND no speech frames (no_speech gate)
    quiet = _quiet(rng, n)
    # burst: low floor with loud speech-like bursts — neither gate fires
    burst = (0.01 * rng.standard_normal(n)).astype(np.float32)
    burst[: n // 3] += (0.5 * rng.standard_normal(n // 3)).astype(np.float32)
    burst = burst.clip(-1, 1)
    # mid-level uniform noise (~30 LSB): above the silence rms floor AND
    # above the 16-LSB dropout floor, but no frame clears the +10 dB
    # adaptive threshold → ONLY no_speech fires
    lsb = rng.uniform(25.0, 35.0, n) * np.where(rng.random(n) < 0.5, -1, 1)
    mid = (lsb / 32767.0).astype(np.float32)
    rows = [(f"q{i}", quiet) for i in range(3)]
    rows += [(f"b{i}", burst) for i in range(3)]
    rows += [("m0", mid)]
    return _clips(spark, rows)


def test_counts_kappa_and_verdicts(spark):
    out = gate_agreement(spark, _planted(spark)).collect()
    by = {(r["gate_a"], r["gate_b"]): r for r in out}
    assert len(by) == 10  # 5 gates → 10 pairs, every pair present once

    r = by[("no_speech", "silence")]
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (3, 1, 0, 3)
    # po = 6/7, pe = 24/49 → kappa = 18/25
    assert r["po"] == round(6 / 7 + 1e-9, 4)
    assert r["kappa"] == 0.72
    assert r["verdict"] == "correlated"

    # sub-silence audio is by construction sub-dropout-floor (1e-4 rms <
    # 16-LSB floor): the two fire on exactly the same clips here →
    # the query reports the structural redundancy
    r = by[("dropout", "silence")]
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (3, 0, 0, 4)
    assert r["kappa"] == 1.0
    assert r["verdict"] == "redundant"

    # clipping never fires, dropout does → chance-corrected agreement 0
    r = by[("clipping", "dropout")]
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (0, 0, 3, 4)
    assert r["kappa"] == 0.0
    assert r["verdict"] == "independent"

    # clipping vs silence: silence fires, clipping never → also 0
    r = by[("clipping", "silence")]
    assert r["kappa"] == 0.0
    assert r["verdict"] == "independent"


def test_redundant_when_gates_coincide(spark):
    rng = np.random.default_rng(9)
    n = SR
    quiet = _quiet(rng, n)
    burst = (0.01 * rng.standard_normal(n)).astype(np.float32)
    burst[: n // 3] += (0.5 * rng.standard_normal(n // 3)).astype(np.float32)
    burst = burst.clip(-1, 1)
    df = _clips(
        spark,
        [(f"q{i}", quiet) for i in range(3)]
        + [(f"b{i}", burst) for i in range(3)],
    )
    by = {
        (r["gate_a"], r["gate_b"]): r
        for r in gate_agreement(spark, df).collect()
    }
    r = by[("no_speech", "silence")]
    assert (r["n11"], r["n00"]) == (3, 3)
    assert r["kappa"] == 1.0
    assert r["verdict"] == "redundant"
