"""SpecAugment — deterministic time/frequency masking over filterbank
feature tensors (Park et al. 2019, "SpecAugment: A Simple Data
Augmentation Method for ASR", arXiv:1904.08779 — public paper).

The third standard speech augmentation next to speed perturbation and
noise mixing (operators/augment.py): zero out random contiguous frame
spans (time masks) and band spans (frequency masks) of the (n_frames x
n_bands) log-energy matrix, replacing them with the matrix mean. Applied
at curation time it materializes the augmented tensor shards once instead
of per training epoch.

Determinism contract (same as noise_mix): masks are seeded from the
clip_id content hash, NEVER a global RNG — a stage retry or a different
batch packing regenerates byte-identical tensors. The mask geometry
sampler (``mask_spans``) is shared verbatim with the fixture replay
(fixtures.py), so the DuckDB oracle for the stats query is bit-identical
by construction.

Spark shape: one ``mapInPandas`` projection on the scan — decode, feature
extraction (same closed-form filterbank as operators/features.py, pinned
equal in tests/test_specaugment.py) and masking all die in the worker;
what leaves is the bounded masked tensor plus scalar mask stats. No
shuffle.

Reference analog: the derived-artifact visitor pattern
(``wallaby2caom2/preview_augmentation.py:77-97``) — payload in, derived
typed artifact out, one Arrow-batched stage.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio
from .features import _band_matrix, _frame_matrix

SPECAUG_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("sa_ok", T.BooleanType()),
        T.StructField("sa_bytes", T.BinaryType()),  # masked float32 tensor
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bands", T.IntegerType()),
        T.StructField("masked_cells", T.LongType()),
        T.StructField("masked_frac", T.DoubleType()),
        T.StructField("mean_before", T.DoubleType()),
        T.StructField("mean_after", T.DoubleType()),
    ]
)

# standard small-model policy scaled to the 12-band geometry
N_TIME_MASKS = 2
MAX_TIME_MASK = 10  # frames
N_FREQ_MASKS = 2
MAX_FREQ_MASK = 2  # bands


def specaug_seed(clip_id: str) -> int:
    """Content-addressed mask seed, domain-separated from the noise-mix
    seed (operators/augment.py _clip_seed) so the two augmentations are
    statistically independent per clip."""
    return zlib.crc32(f"{clip_id}:specaug".encode("utf-8")) & 0x7FFFFFFF


def mask_spans(
    rng: np.random.Generator, n: int, max_width: int, n_masks: int
) -> list[tuple[int, int]]:
    """n_masks (start, width) spans over [0, n); width ~ U{0..min(max,n)},
    start ~ U{0..n-width}. Draw ORDER is fixed (width then start, time
    masks before freq masks) — part of the determinism contract."""
    spans = []
    for _ in range(n_masks):
        w = int(rng.integers(0, min(max_width, n) + 1))
        s = int(rng.integers(0, n - w + 1)) if n > w else 0
        spans.append((s, w))
    return spans


def specaugment_clip(
    feats: np.ndarray, clip_id: str
) -> tuple[np.ndarray, int]:
    """(n_frames, n_bands) float32 → (masked copy, masked-cell count).
    Shared verbatim with the fixture replay."""
    rng = np.random.default_rng(specaug_seed(clip_id))
    n_frames, n_bands = feats.shape
    fill = np.float32(feats.mean())
    mask = np.zeros((n_frames, n_bands), dtype=bool)
    for s, w in mask_spans(rng, n_frames, MAX_TIME_MASK, N_TIME_MASKS):
        mask[s : s + w, :] = True
    for s, w in mask_spans(rng, n_bands, MAX_FREQ_MASK, N_FREQ_MASKS):
        mask[:, s : s + w] = True
    out = feats.copy()
    out[mask] = fill
    return out, int(mask.sum())


def specaugment_features(
    df: DataFrame,
    frame_ms: int = 25,
    hop_ms: int = 10,
    n_bands: int = 12,
    sr_out: int = 16000,
) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → masked feature tensor + mask stats
    per decodable clip (sa_ok=false containment row otherwise). Feature
    definition is IDENTICAL to operators/features.py (same window/band
    math on the same resampled signal)."""
    win = int(round(frame_ms * sr_out / 1000.0))
    hop = int(round(hop_ms * sr_out / 1000.0))
    hann = np.hanning(win).astype(np.float64)
    bands = _band_matrix(win // 2 + 1, n_bands)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in SPECAUG_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                sr = sr_meas or audio.declared_sr(sr_decl)
                row = dict(
                    clip_id=cid, sa_ok=False, sa_bytes=None,
                    n_frames=0, n_bands=n_bands, masked_cells=0,
                    masked_frac=0.0, mean_before=0.0, mean_after=0.0,
                )
                if samples is not None and len(samples) > 0 and sr > 0:
                    x = audio.resample_linear(samples, sr, sr_out).astype(
                        np.float64
                    )
                    frames = _frame_matrix(x, win, hop)
                    if len(frames):
                        spec = np.fft.rfft(frames * hann, axis=1)
                        power = spec.real**2 + spec.imag**2
                        feats = np.log10(power @ bands + 1e-10).astype(
                            np.float32
                        )
                        masked, n_cells = specaugment_clip(feats, str(cid))
                        row.update(
                            sa_ok=True,
                            sa_bytes=masked.tobytes(),
                            n_frames=int(feats.shape[0]),
                            masked_cells=n_cells,
                            masked_frac=n_cells / feats.size,
                            mean_before=float(feats.mean()),
                            mean_after=float(masked.mean()),
                        )
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "sa_ok": pd.Series(out["sa_ok"], dtype=bool),
                    "sa_bytes": pd.Series(out["sa_bytes"], dtype=object),
                    "n_frames": pd.Series(out["n_frames"], dtype=np.int32),
                    "n_bands": pd.Series(out["n_bands"], dtype=np.int32),
                    "masked_cells": pd.Series(
                        out["masked_cells"], dtype=np.int64
                    ),
                    "masked_frac": pd.Series(
                        out["masked_frac"], dtype=np.float64
                    ),
                    "mean_before": pd.Series(
                        out["mean_before"], dtype=np.float64
                    ),
                    "mean_after": pd.Series(
                        out["mean_after"], dtype=np.float64
                    ),
                }
            )

    cols = ["clip_id", "bytes", "codec", "sr_hz"]
    return df.select(*cols).mapInPandas(_run, SPECAUG_SCHEMA)
