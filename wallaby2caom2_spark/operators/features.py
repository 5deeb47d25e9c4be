"""Frame-level filterbank feature extraction — the tensor-producing step an
ASR training pipeline runs after filtering/normalization: each kept clip
becomes a (n_frames x n_bands) log-energy feature matrix, stored as one
compact float32 buffer per clip (training shards read whole-clip tensors;
exploding to per-frame rows would 100x the row count for no access-pattern
gain at 10^12 clips).

Spark shape: one ``mapInPandas`` projection on the scan — payload decodes,
frames, FFTs and dies inside the worker; what leaves is the bounded feature
buffer (n_frames x n_bands x 4 bytes ≈ 3% of the payload at the default
geometry). No shuffle. All math is batch-level vectorized numpy: framing is
a stride-tricks view (no copy), the FFT runs on the whole (n_frames, win)
matrix at once, band pooling is one matmul against a fixed band matrix.

Feature definition (deterministic, library-free): resample to ``sr_out``,
frame ``frame_ms``/``hop_ms`` with a Hann window, power spectrum via rFFT,
``n_bands`` equal-width band energies (DC excluded), log10 with a 1e-10
floor. Equal-width bands rather than mel spacing keeps the oracle in
tests/test_features.py exactly recomputable without a mel library; swapping
the band matrix for a mel filterbank is a one-line change at deployment.

Reference analog: the preview/thumbnail DERIVED-ARTIFACT visitor
(``wallaby2caom2/preview_augmentation.py:77-97``) — per item, a binary in,
a derived typed artifact out — re-expressed as one Arrow-batched stage.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("feat_ok", T.BooleanType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bands", T.IntegerType()),
        T.StructField("feat_bytes", T.BinaryType()),  # float32 row-major
        T.StructField("mean_log_energy", T.DoubleType()),
    ]
)


def _frame_matrix(x: np.ndarray, win: int, hop: int) -> np.ndarray:
    """(n,) → (n_frames, win) zero-copy strided view (full frames only)."""
    n_frames = 1 + (len(x) - win) // hop if len(x) >= win else 0
    if n_frames <= 0:
        return np.empty((0, win), dtype=x.dtype)
    return np.lib.stride_tricks.as_strided(
        x,
        shape=(n_frames, win),
        strides=(x.strides[0] * hop, x.strides[0]),
        writeable=False,
    )


def _band_matrix(n_fft_bins: int, n_bands: int) -> np.ndarray:
    """(n_fft_bins, n_bands) 0/1 pooling matrix, DC bin excluded, equal-width
    contiguous bands covering bins [1, n_fft_bins)."""
    m = np.zeros((n_fft_bins, n_bands), dtype=np.float64)
    usable = n_fft_bins - 1
    edges = np.linspace(1, n_fft_bins, n_bands + 1).astype(int)
    for b in range(n_bands):
        m[edges[b] : edges[b + 1], b] = 1.0
    assert usable >= n_bands, "more bands than FFT bins"
    return m


def feature_frames(
    df: DataFrame,
    frame_ms: int = 25,
    hop_ms: int = 10,
    n_bands: int = 12,
    sr_out: int = 16000,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → one feature-tensor row per decodable
    clip (feat_ok=false containment row otherwise, same contract as decode).

    ``passthrough`` copies extra input columns verbatim onto the output
    (same contract as operators/vad.py): compute slim values (lang,
    scrubbed transcript) BEFORE this stage and carry them through, so a
    consumer like the shard exporter needs ZERO joins instead of re-keying
    two derivations of the same scan on clip_id."""
    win = int(round(frame_ms * sr_out / 1000.0))
    hop = int(round(hop_ms * sr_out / 1000.0))
    hann = np.hanning(win).astype(np.float64)
    n_bins = win // 2 + 1
    bands = _band_matrix(n_bins, n_bands)

    schema = T.StructType(
        list(FEATURE_SCHEMA.fields) + [df.schema[name] for name in passthrough]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in FEATURE_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                sr = sr_meas or audio.declared_sr(sr_decl)
                row = {
                    "clip_id": cid,
                    "feat_ok": False,
                    "n_frames": 0,
                    "n_bands": n_bands,
                    "feat_bytes": None,
                    "mean_log_energy": 0.0,
                }
                if samples is not None and len(samples) > 0 and sr > 0:
                    x = audio.resample_linear(samples, sr, sr_out).astype(
                        np.float64
                    )
                    frames = _frame_matrix(x, win, hop)
                    if len(frames):
                        spec = np.fft.rfft(frames * hann, axis=1)
                        power = (spec.real**2 + spec.imag**2)
                        feats = np.log10(power @ bands + 1e-10).astype(
                            np.float32
                        )
                        row.update(
                            feat_ok=True,
                            n_frames=int(feats.shape[0]),
                            feat_bytes=feats.tobytes(),
                            mean_log_energy=float(feats.mean()),
                        )
                for k, v in row.items():
                    out[k].append(v)
            cols = {
                "clip_id": pd.Series(out["clip_id"], dtype=object),
                "feat_ok": pd.Series(out["feat_ok"], dtype=bool),
                "n_frames": pd.Series(out["n_frames"], dtype=np.int32),
                "n_bands": pd.Series(out["n_bands"], dtype=np.int32),
                "feat_bytes": pd.Series(out["feat_bytes"], dtype=object),
                "mean_log_energy": pd.Series(
                    out["mean_log_energy"], dtype=np.float64
                ),
            }
            for name in passthrough:
                cols[name] = pdf[name]
            yield pd.DataFrame(cols)

    return df.select(
        "clip_id", "bytes", "codec", "sr_hz", *passthrough
    ).mapInPandas(_extract, schema)
