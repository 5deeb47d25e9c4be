"""Canonical-container transcode with checksum verification.

A 100 TB corpus migration's first normalization step is container
canonicalization: whatever mix of raw PCM / WAV / FLAC the crawl delivered,
the training-side layout wants ONE container, and the migration must prove
per clip that the rewrite was lossless — "it probably round-trips" is not
an answer when the source bytes are about to be retired. This operator
performs that step in-engine: decode to int16 → re-encode into the
canonical WAV container → decode AGAIN and compare sample-exact, emitting a
CRC32 of the canonical payload as the content checksum the manifest /
dedup bookkeeping layers key on (two clips that differ only by container
now collide on ``canon_crc32``).

Per clip: ``tc_exact`` is the sample-exact round-trip verdict (int16 in ==
int16 out), ``size_ratio`` = canonical bytes / source bytes (shows the
container overhead being added or shed), ``canon_crc32`` = zlib CRC32 of
the canonical WAV bytes. Containment (``tc_ok=false``): undecodable source
or a rateless raw-PCM clip with no usable declared rate (nothing to write
into the canonical header).

Spark shape: one ``mapInPandas`` projection on the scan — both payloads
(source and canonical) die in the worker; a bool, two numbers and a
checksum leave. The per-clip math is the shared ``clip_transcode``
function, replayed verbatim by the oracle fixture (fixtures.py) so the
DuckDB oracle value-hash-checks the migration report.

Reference analog: the file-transfer + checksum step of the curation loop
(``wallaby2caom2/composable.py:115-138`` stores artifacts and trusts
md5-named replicas).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import audio

TRANSCODE_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("tc_ok", T.BooleanType()),
        T.StructField("tc_exact", T.BooleanType()),
        T.StructField("canon_len", T.IntegerType()),
        T.StructField("size_ratio", T.DoubleType()),
        T.StructField("canon_crc32", T.LongType()),
    ]
)


def clip_transcode(
    payload: bytes | None, codec: str, sr_decl
) -> tuple[bool, int, float, int] | None:
    """source payload → (exact, canon_len, size_ratio, crc32), or None when
    the source is undecodable / rateless. SINGLE definition of the per-clip
    math (Spark UDF + oracle fixture)."""
    x16, sr_meas = audio.decode_clip_i16(payload, codec)
    sr = sr_meas or audio.declared_sr(sr_decl)
    if x16 is None or len(x16) == 0 or sr <= 0:
        return None
    canon = audio.encode_wav(x16.astype(np.float32) / 32767.0, sr)
    back, sr_back = audio.decode_clip_i16(canon, "wav")
    exact = (
        back is not None
        and sr_back == sr
        and len(back) == len(x16)
        and bool(np.array_equal(back, x16))
    )
    src_len = len(payload) if payload is not None else 0
    ratio = len(canon) / src_len if src_len > 0 else 0.0
    return exact, len(canon), ratio, zlib.crc32(canon)


def transcode_stats(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, codec, sr_hz) → one canonicalization row per clip
    (``tc_ok=false`` containment row when undecodable/rateless)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in TRANSCODE_SCHEMA}
            for cid, raw, codec, sr_decl in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                res = clip_transcode(
                    bytes(raw) if raw is not None else None, codec, sr_decl
                )
                if res is None:
                    row = (cid, codec, False, False, 0, 0.0, 0)
                else:
                    row = (cid, codec, True, *res)
                for k, v in zip(out, row):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "clip_id": pd.Series(out["clip_id"], dtype=object),
                    "codec": pd.Series(out["codec"], dtype=object),
                    "tc_ok": pd.Series(out["tc_ok"], dtype=bool),
                    "tc_exact": pd.Series(out["tc_exact"], dtype=bool),
                    "canon_len": pd.Series(out["canon_len"], dtype=np.int32),
                    "size_ratio": pd.Series(
                        out["size_ratio"], dtype=np.float64
                    ),
                    "canon_crc32": pd.Series(
                        out["canon_crc32"], dtype=np.int64
                    ),
                }
            )

    return df.select("clip_id", "bytes", "codec", "sr_hz").mapInPandas(
        _extract, TRANSCODE_SCHEMA
    )
