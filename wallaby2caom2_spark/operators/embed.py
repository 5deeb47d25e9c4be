"""Audio semantic embeddings: decoded clip → pooled filterbank vector.

The bridge between the audio modality and the similarity family
(queries/similarity.py): an embedding column (`array<double>`) per clip,
so the corpus-scale vector machinery — hyperplane LSH bucketing, IVF,
brute-force cosine baselines — runs over AUDIO CONTENT, not just the
synthetic embeddings table. Where the 60-bit fingerprint
(operators/audio_fp.py) answers "is this the SAME recording?"
(re-delivery, re-encode), the embedding answers "does this SOUND like
that?" (cosine neighborhood) — the two ends of the audio-dedup spectrum.

The embedding is deliberately first-party and closed-form: the SAME
filterbank matrix the feature stage extracts (operators/features.py —
Hann-windowed 25 ms / 10 ms frames, rFFT, 12 triangular-ish band pools,
log10), pooled to a 24-dim vector by per-band mean and std over frames.
Mean captures spectral shape (what bands carry energy), std captures
temporal dynamics (speech modulates, tones don't). In a real deployment
the pooling UDF body is swapped for a model forward pass; every plan
around it — one Arrow crossing, slim vector out, payload dies in the
worker — is unchanged.

Oracle strategy: the fixture (fixtures.py) computes the identical feats
matrix per clip and pools it with the SAME shared function
(``pool_embedding``), storing the float64 vector — so DuckDB replays
every downstream cosine/bucket computation with ``list_dot_product`` on
bit-identical inputs.

Reference analog: the preview/metadata derived-artifact visitors —
payload in, compact typed derivation out, one batched stage
(``wallaby2caom2/preview_augmentation.py:77-97``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio
from .features import _band_matrix, _frame_matrix

N_BANDS = 12
EMB_DIM = 2 * N_BANDS  # per-band mean + per-band std
_SR_OUT = 16000
_WIN = 400  # 25 ms at 16 kHz (features stage defaults)
_HOP = 160  # 10 ms

EMBED_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("emb_ok", T.BooleanType()),
        T.StructField("emb", T.ArrayType(T.DoubleType())),
    ]
)


def pool_embedding(feats: np.ndarray) -> np.ndarray:
    """(n_frames x n_bands) float32 log-energy matrix → 2*n_bands float64
    vector (per-band mean ++ per-band std). Shared VERBATIM with the
    fixture replay so the persisted oracle vectors are bit-identical."""
    f = feats.astype(np.float64)
    return np.concatenate([f.mean(axis=0), f.std(axis=0)])


def clip_feats(samples: np.ndarray | None, sr: int) -> np.ndarray | None:
    """The feature stage's exact per-clip filterbank computation
    (operators/features.py ``_extract`` body, defaults pinned): resample
    to 16 kHz, frame, window, rFFT power, band pool, log10. None when the
    clip is undecodable or yields zero frames."""
    if samples is None or len(samples) == 0 or sr <= 0:
        return None
    x = audio.resample_linear(samples, sr, _SR_OUT).astype(np.float64)
    frames = _frame_matrix(x, _WIN, _HOP)
    if not len(frames):
        return None
    hann = np.hanning(_WIN).astype(np.float64)
    bands = _band_matrix(_WIN // 2 + 1, N_BANDS)
    spec = np.fft.rfft(frames * hann, axis=1)
    power = spec.real**2 + spec.imag**2
    return np.log10(power @ bands + 1e-10).astype(np.float32)


def embed_clips(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz, ...) → (clip_id, emb_ok, emb).

    One mapInPandas crossing; the payload dies in the worker and only the
    24-double vector leaves (~200 B/row — broadcast- and shuffle-friendly
    at any corpus size). Undecodable clips emit ``emb_ok=false`` with the
    ZERO vector, not NULL: vector kernels downstream (JVM folds, DuckDB's
    ``list_dot_product``, a future ANN index) must never meet a NULL list
    — DuckDB's kernel in particular rejects any chunk whose list column
    carries a validity mask, even behind WHERE/CASE. ``emb_ok`` is the
    gate; the zero vector is inert under dot products."""

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zero = [0.0] * EMB_DIM
        for pdf in batches:
            ids, oks, embs = [], [], []
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                sr = sr_meas or audio.declared_sr(sr_decl)
                feats = clip_feats(samples, sr)
                ids.append(cid)
                if feats is None:
                    oks.append(False)
                    embs.append(list(zero))
                else:
                    oks.append(True)
                    embs.append(pool_embedding(feats).tolist())
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(ids, dtype=object),
                    "emb_ok": pd.Series(oks, dtype=bool),
                    "emb": pd.Series(embs, dtype=object),
                }
            )

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        _embed, EMBED_SCHEMA
    )
