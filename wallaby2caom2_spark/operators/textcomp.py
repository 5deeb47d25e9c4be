"""Transcript compressibility gate — zlib ratio as a text-quality signal.

Compression ratio is the classic cheap detector for the two transcript
failure modes the token-level rules are weakest on: NEAR-DUPLICATE
BOILERPLATE (templated captions, looped phrases — compresses far below
natural language) and NON-LINGUISTIC NOISE (OCR junk, random characters —
compresses worse than natural language). Deflate's 32 KB window sees every
repetition structure at transcript length, so one number separates
repetitive / natural / dense text without any language model; large-corpus
curation stacks use exactly this signal as a pre-filter ahead of the
expensive perplexity pass.

Per transcript: ``ratio = len(zlib.compress(utf8, 6)) / len(utf8)``.
Containment (``z_ok=false``): NULL or empty transcript. Very short
transcripts land in the ``header_bound`` band (ratio ≥ 1 — the zlib
header/dictionary overhead dominates), which the gate reports rather than
hides: "too short to judge by compression" is itself a signal.

Spark shape: an Arrow-batched ``mapInPandas`` over TWO SLIM COLUMNS
(clip_id, transcript) — column pruning keeps the audio payload out of the
scan entirely; the band classification is codegen. The per-transcript math
is the shared ``transcript_compression`` function, replayed verbatim by the
oracle fixture (fixtures.py): DuckDB cannot deflate, so only a genuine
zlib pass hash-matches.

Reference analog: the metadata sanity-visitor family
(``wallaby2caom2/main_app.py:153-170``).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_ZLIB_LEVEL = 6  # pinned: ratio is level-dependent, both sides must agree

TEXTCOMP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("z_ok", T.BooleanType()),
        T.StructField("raw_len", T.IntegerType()),
        T.StructField("z_len", T.IntegerType()),
        T.StructField("z_ratio", T.DoubleType()),
    ]
)


def transcript_compression(text: str | None) -> tuple[int, int, float] | None:
    """transcript → (raw_len, z_len, ratio), or None when NULL/empty.
    SINGLE definition of the per-transcript math (Spark UDF + oracle
    fixture)."""
    if text is None:
        return None
    raw = text.encode("utf-8")
    if len(raw) == 0:
        return None
    z = zlib.compress(raw, _ZLIB_LEVEL)
    return len(raw), len(z), len(z) / len(raw)


def compression_stats(df: DataFrame) -> DataFrame:
    """(clip_id, transcript) → one compressibility row per transcript
    (``z_ok=false`` containment row when NULL/empty)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in TEXTCOMP_SCHEMA}
            for cid, text in zip(pdf["clip_id"], pdf["transcript"]):
                res = transcript_compression(text)
                if res is None:
                    row = (cid, False, 0, 0, 0.0)
                else:
                    row = (cid, True, *res)
                for k, v in zip(out, row):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "z_ok": pd.Series(out["z_ok"], dtype=bool),
                    "raw_len": pd.Series(out["raw_len"], dtype=np.int32),
                    "z_len": pd.Series(out["z_len"], dtype=np.int32),
                    "z_ratio": pd.Series(out["z_ratio"], dtype=np.float64),
                }
            )

    return df.select("clip_id", "transcript").mapInPandas(
        _extract, TEXTCOMP_SCHEMA
    )
