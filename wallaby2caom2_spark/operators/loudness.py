"""Program-loudness gate — BS.1770-style gated integrated loudness.

Broadcast loudness (ITU-R BS.1770 / EBU R128, both published specs) is the
corpus-QC measure that peak or plain RMS cannot replace: it K-weights the
spectrum toward what the ear hears (a ~+4 dB high shelf above ~1.5 kHz and
a ~38 Hz high-pass that discounts rumble) and it GATES the measurement so
long silences and room tone cannot drag a mostly-quiet clip's level down —
the two-stage gate (absolute −70 LUFS, then relative −10 LU under the
gated mean) makes the number track the program material. A speech corpus
normalized by ungated RMS systematically over-boosts clips with long
pauses; a loudness gate screens the clips whose program level is outside
the trainable window before augmentation and normalization run.

First-party implementation over 400 ms blocks at 75 % overlap (the spec's
momentary window). The K pre-filter is applied SPECTRALLY per block: each
block's rfft power is weighted by the squared magnitude response
|H1|²·|H2|² of the two published biquads (high shelf f0=1681.97 Hz
G=+3.9998 dB Q=0.7072; high-pass f0=38.135 Hz Q=0.5003 — the standard
BS.1770 prototypes re-tuned for the clip's own sample rate via the
bilinear-transform design formulas), and the block's weighted mean square
falls out of Parseval. This is circular (per-block) rather than
streaming convolution — block-edge leakage is bounded by the 75 % overlap
and identical in the oracle replay, and it keeps the hot path one batched
``rfft`` instead of a per-sample Python IIR loop.

Spark shape: one ``mapInPandas`` projection on the scan — payload dies in
the worker, five scalars leave, no shuffle. The per-clip math is the
shared ``clip_loudness`` function, replayed verbatim into the oracle
fixture (fixtures.py) so the DuckDB oracle value-hash-checks the gate.

Reference analog: the metadata sanity-visitor family
(``wallaby2caom2/main_app.py:153-170``).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio

_BLOCK_S = 0.400  # momentary window (BS.1770)
_HOP_S = 0.100  # 75 % overlap
_ABS_GATE_LUFS = -70.0  # absolute gate
_REL_GATE_LU = -10.0  # relative gate below the abs-gated mean
_MIN_SR = 4000  # shelf corner must sit below Nyquist
_TINY = 1e-30

LOUDNESS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("loud_ok", T.BooleanType()),
        T.StructField("lufs", T.DoubleType()),
        T.StructField("peak_dbfs", T.DoubleType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("n_gated_blocks", T.IntegerType()),
        T.StructField("block_range_db", T.DoubleType()),
    ]
)


def _k_weight_power(freqs: np.ndarray, sr: int) -> np.ndarray:
    """|H1(f)|²·|H2(f)|² of the two BS.1770 pre-filter biquads designed for
    sample rate ``sr`` (published prototype constants; bilinear design)."""
    # stage 1: high shelf
    f0, gain_db, q = 1681.974450955533, 3.999843853973347, 0.7071752369554196
    k = math.tan(math.pi * f0 / sr)
    vh = 10.0 ** (gain_db / 20.0)
    vb = vh**0.4996667741545416
    a0 = 1.0 + k / q + k * k
    b_shelf = (
        (vh + vb * k / q + k * k) / a0,
        2.0 * (k * k - vh) / a0,
        (vh - vb * k / q + k * k) / a0,
    )
    a_shelf = (1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0)
    # stage 2: high pass (spec's unnormalized b = [1, -2, 1])
    f0, q = 38.13547087602444, 0.5003270373238773
    k = math.tan(math.pi * f0 / sr)
    a0 = 1.0 + k / q + k * k
    b_hp = (1.0, -2.0, 1.0)
    a_hp = (1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0)

    w = 2.0 * np.pi * freqs / sr
    cw, c2w = np.cos(w), np.cos(2.0 * w)

    def mag2(b, a):
        num = (
            b[0] * b[0]
            + b[1] * b[1]
            + b[2] * b[2]
            + 2.0 * (b[0] * b[1] + b[1] * b[2]) * cw
            + 2.0 * b[0] * b[2] * c2w
        )
        den = (
            1.0
            + a[1] * a[1]
            + a[2] * a[2]
            + 2.0 * (a[1] + a[1] * a[2]) * cw
            + 2.0 * a[2] * c2w
        )
        return num / den

    return mag2(b_shelf, a_shelf) * mag2(b_hp, a_hp)


def clip_loudness(
    samples: np.ndarray | None, sr: int
) -> tuple[float, float, int, int, float] | None:
    """float32 samples at ``sr`` → (lufs, peak_dbfs, n_blocks,
    n_gated_blocks, block_range_db), or None when undecodable / rate too
    low for the shelf corner / shorter than one 400 ms block / fully
    below the absolute gate. SINGLE definition of the per-clip math
    (Spark UDF + oracle fixture)."""
    if samples is None or sr < _MIN_SR:
        return None
    block = int(round(_BLOCK_S * sr))
    hop = int(round(_HOP_S * sr))
    if len(samples) < block:
        return None
    x = samples.astype(np.float64)
    frames = np.lib.stride_tricks.sliding_window_view(x, block)[::hop]
    spec = np.fft.rfft(frames, axis=1)
    power = spec.real * spec.real + spec.imag * spec.imag
    # rfftfreq is cycles/sample; × sr → Hz
    weight = _k_weight_power(np.fft.rfftfreq(block) * sr, sr)
    # Parseval: filtered mean square = (w0|X0|² + 2Σwk|Xk|² [+ wN|XN|²]) / N²
    scale = np.full(power.shape[1], 2.0)
    scale[0] = 1.0
    if block % 2 == 0:
        scale[-1] = 1.0
    z = (power * (weight * scale)).sum(axis=1) / (block * block)
    levels = -0.691 + 10.0 * np.log10(z + _TINY)
    abs_mask = levels > _ABS_GATE_LUFS
    if not abs_mask.any():
        return None
    gamma = -0.691 + 10.0 * np.log10(z[abs_mask].mean() + _TINY) + _REL_GATE_LU
    rel_mask = abs_mask & (levels > gamma)
    lufs = -0.691 + 10.0 * math.log10(float(z[rel_mask].mean()) + _TINY)
    peak = float(np.max(np.abs(x)))
    peak_dbfs = 20.0 * math.log10(peak) if peak > 0.0 else -120.0
    p10, p95 = np.percentile(levels[abs_mask], [10.0, 95.0])
    return (
        float(lufs),
        float(peak_dbfs),
        int(len(z)),
        int(rel_mask.sum()),
        float(p95 - p10),
    )


def loudness_stats(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → one loudness row per clip
    (``loud_ok=false`` containment row when unmeasurable)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in LOUDNESS_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                sr = sr_meas or audio.declared_sr(sr_decl)
                res = clip_loudness(samples, sr)
                if res is None:
                    row = (cid, False, -120.0, -120.0, 0, 0, 0.0)
                else:
                    row = (cid, True, *res)
                for key, v in zip(out, row):
                    out[key].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "loud_ok": pd.Series(out["loud_ok"], dtype=bool),
                    "lufs": pd.Series(out["lufs"], dtype=np.float64),
                    "peak_dbfs": pd.Series(out["peak_dbfs"], dtype=np.float64),
                    "n_blocks": pd.Series(out["n_blocks"], dtype=np.int32),
                    "n_gated_blocks": pd.Series(
                        out["n_gated_blocks"], dtype=np.int32
                    ),
                    "block_range_db": pd.Series(
                        out["block_range_db"], dtype=np.float64
                    ),
                }
            )

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        _extract, LOUDNESS_SCHEMA
    )
