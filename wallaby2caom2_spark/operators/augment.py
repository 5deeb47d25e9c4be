"""Speed-perturbation augmentation: one clip row → one row per factor.

The standard ASR training-data augmentation (Kaldi/sox-style 3-way speed
perturb at 0.9/1.0/1.1): for factor ``f`` the waveform is resampled as if
its input rate were ``sr*f`` and played back at ``sr`` — duration scales by
``1/f``, pitch shifts with it, and the corpus triples with acoustically
distinct copies.  Factor 1.0 is the identity (byte-exact round trip for WAV
inputs), so the original corpus is a strict subset of the augmented one.

Spark shape: one→many ``mapInPandas`` directly on the scan, the same fan-out
contract as ``operators/segment.py`` — the input payload is consumed in the
worker and replaced by per-factor payloads whose total size is ~sum(1/f) of
the input; no shuffle is introduced, and the emitted ``aug_id`` key
(``clip_id#sp{f}``) keeps downstream dedup/join semantics identical to the
base corpus.  Undecodable clips emit zero augmented rows (error
containment — the cascade has already routed them to ``decode_failed``).

Reference analog: the derived-artifact fan-out of preview generation
(``wallaby2caom2/preview_augmentation.py:77-97``) — new payload artifacts
derived per input item, named by a deterministic suffix rule.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio

AUGMENT_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("aug_id", T.StringType()),
        T.StructField("factor", T.DoubleType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms_out", T.IntegerType()),
        T.StructField("aug_bytes", T.BinaryType()),
        T.StructField("out_rms", T.DoubleType()),
    ]
)


def speed_perturb(
    df: DataFrame,
    factors: Sequence[float] = (0.9, 1.0, 1.1),
) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → one WAV row per (clip, factor).

    Output rows carry the SAME sample rate as the decoded input; only the
    duration (and pitch) change.  ``aug_id`` = ``clip_id#sp{factor}`` is the
    training-corpus key; ``clip_id`` is kept so lineage joins back to the
    source clip without string surgery.
    """
    fs = tuple(float(f) for f in factors)
    if not fs or any(f <= 0 for f in fs):
        raise ValueError(f"factors must be positive, got {factors!r}")

    def _augment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in AUGMENT_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                if samples is None or len(samples) == 0:
                    continue
                sr = sr_meas or audio.declared_sr(sr_decl)
                if sr <= 0:
                    continue
                for f in fs:
                    if f == 1.0:
                        y = samples
                    else:
                        # input-rate reinterpretation: resample sr*f → sr
                        y = audio.resample_linear(
                            samples, int(round(sr * f)), sr
                        )
                    if len(y) == 0:
                        continue
                    out["clip_id"].append(cid)
                    out["aug_id"].append(f"{cid}#sp{f:g}")
                    out["factor"].append(f)
                    out["sr_hz"].append(sr)
                    out["dur_ms_out"].append(
                        int(round(len(y) * 1000.0 / sr))
                    )
                    out["aug_bytes"].append(audio.encode_wav(y, sr))
                    out["out_rms"].append(
                        float(np.sqrt(np.mean(np.square(y, dtype=np.float64))))
                    )
            yield pd.DataFrame(out)

    cols = ["clip_id", "bytes", "codec", "sr_hz"]
    return df.select(*cols).mapInPandas(_augment, AUGMENT_SCHEMA)


NOISE_MIX_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("aug_id", T.StringType()),
        T.StructField("target_snr_db", T.DoubleType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("mix_ok", T.BooleanType()),
        T.StructField("aug_bytes", T.BinaryType()),
        T.StructField("out_rms", T.DoubleType()),
    ]
)


def _clip_seed(clip_id: str) -> int:
    """Deterministic per-clip RNG seed — content-addressed, so a stage
    retry regenerates byte-identical noise (the same retry-safety contract
    as the salted repartition; NEVER a global RNG, whose draws would depend
    on row order within the batch)."""
    import zlib

    return zlib.crc32(clip_id.encode("utf-8")) & 0x7FFFFFFF


def noise_mix(
    df: DataFrame,
    snr_db: float = 20.0,
) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → one WAV row per clip with white
    noise mixed in at ``snr_db`` below the signal — the robustness
    augmentation ASR corpora apply alongside speed perturbation.

    Noise is seeded from the clip_id alone, so re-running (or a lost
    executor re-computing) any partition reproduces identical payloads.
    Silent clips (zero rms — nothing to anchor the SNR to) emit
    ``mix_ok=false`` with the original samples re-encoded untouched, never
    a batch failure.
    """

    def _mix(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in NOISE_MIX_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                samples, sr_meas = audio.decode_clip(
                    bytes(raw) if raw is not None else None, codec
                )
                if samples is None or len(samples) == 0:
                    continue
                sr = sr_meas or audio.declared_sr(sr_decl)
                if sr <= 0:
                    continue
                sig_rms = float(
                    np.sqrt(np.mean(np.square(samples, dtype=np.float64)))
                )
                ok = sig_rms > 0.0
                if ok:
                    rng = np.random.default_rng(_clip_seed(str(cid)))
                    noise_rms = sig_rms / (10.0 ** (snr_db / 20.0))
                    y = np.clip(
                        samples
                        + (noise_rms * rng.standard_normal(len(samples))).astype(
                            np.float32
                        ),
                        -1.0,
                        1.0,
                    )
                else:
                    y = samples
                out["clip_id"].append(cid)
                out["aug_id"].append(f"{cid}#nz{snr_db:g}")
                out["target_snr_db"].append(float(snr_db))
                out["sr_hz"].append(sr)
                out["mix_ok"].append(ok)
                out["aug_bytes"].append(audio.encode_wav(y, sr))
                out["out_rms"].append(
                    float(np.sqrt(np.mean(np.square(y, dtype=np.float64))))
                )
            yield pd.DataFrame(out)

    cols = ["clip_id", "bytes", "codec", "sr_hz"]
    return df.select(*cols).mapInPandas(_mix, NOISE_MIX_SCHEMA)
