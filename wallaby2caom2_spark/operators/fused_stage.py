"""Single-crossing UDF stage: decode + langid + perplexity + scrub in ONE
mapInArrow pass.

Why one crossing: chained pandas UDFs (decode → text models) each round-trip
every batch JVM→Arrow→Python→Arrow→JVM. On a bandwidth-bound host the extra
memcpy is the difference between 3x and 4x scaling at 32 cores — and at
10^12 rows it is pure waste. This stage reads each Arrow batch once,
computes every python-side feature, and returns slim rows WITHOUT the
payload bytes (the binary column dies inside the worker, so it never
crosses back or shuffles).

Why mapInArrow rather than mapInPandas: the Arrow→pandas conversion of the
binary column materializes one Python ``bytes`` object per clip — a ~50 KB
allocation + memcpy per row that measured ~2.0s of a 6.1s sf0.1/local[32]
pipeline run (profiled via a no-op mapInPandas over ``bytes`` vs the same
scan JVM-side). Operating on the raw Arrow RecordBatch instead lets decode
read each payload as a ZERO-COPY memoryview into the batch's data buffer
(offsets sliced from the offsets buffer), and the passthrough columns
(clip_id, codec, transcript, declared sr/dur) are re-emitted as the input's
own Arrow arrays — no conversion in either direction. Only the computed
feature vectors are newly allocated.

Semantics are identical to operators/decode.py + operators/text_stage.py
(shared functions/ modules); the split stages remain for composability and
are covered by the same golden tests (tests/test_fused_equivalence.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FUSED_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("transcript", T.StringType()),
        T.StructField("pcm_ok", T.BooleanType()),
        T.StructField("sr_meas", T.IntegerType()),
        T.StructField("dur_ms_meas", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("clip_rate", T.DoubleType()),
        T.StructField("dropout_ms", T.DoubleType()),
        T.StructField("lang", T.StringType()),
        T.StructField("lang_conf", T.FloatType()),
        T.StructField("ppl", T.DoubleType()),
        T.StructField("scrubbed_all", T.StringType()),
        T.StructField("scrub_edits_all", T.IntegerType()),
    ]
)


def _binary_views(arr: pa.Array) -> list:
    """Per-row zero-copy memoryviews into a (Large)BinaryArray's data buffer
    (None for nulls). The payloads are never copied out of the Arrow batch —
    decode reads them in place (np.frombuffer / struct.unpack_from accept
    any buffer). Falls back to ``to_pylist`` (one copy) for exotic layouts.
    """
    if not isinstance(arr, (pa.BinaryArray, pa.LargeBinaryArray)):
        return arr.to_pylist()
    n = len(arr)
    off_dtype = np.int64 if isinstance(arr, pa.LargeBinaryArray) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype, offset=0)
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    base = arr.offset
    if arr.null_count == 0:
        return [data[offs[base + i] : offs[base + i + 1]] for i in range(n)]
    valid = arr.is_valid().to_numpy(zero_copy_only=False)
    return [
        data[offs[base + i] : offs[base + i + 1]] if valid[i] else None
        for i in range(n)
    ]


_OUT_PA_SCHEMA = pa.schema(
    [
        pa.field("clip_id", pa.string()),
        pa.field("sr_hz", pa.int32()),
        pa.field("dur_ms", pa.int32()),
        pa.field("codec", pa.string()),
        pa.field("transcript", pa.string()),
        pa.field("pcm_ok", pa.bool_()),
        pa.field("sr_meas", pa.int32()),
        pa.field("dur_ms_meas", pa.int32()),
        pa.field("rms", pa.float64()),
        pa.field("clip_rate", pa.float64()),
        pa.field("dropout_ms", pa.float64()),
        pa.field("lang", pa.string()),
        pa.field("lang_conf", pa.float32()),
        pa.field("ppl", pa.float64()),
        pa.field("scrubbed_all", pa.string()),
        pa.field("scrub_edits_all", pa.int32()),
    ]
)


def fused_features_arrow(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    # worker-side imports: models/tables built once per python worker process
    from ..functions import audio, scrub, textscore

    for batch in batches:
        cols = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
        n = batch.num_rows
        ok = np.zeros(n, dtype=bool)
        srm = np.zeros(n, dtype=np.int32)
        dur = np.zeros(n, dtype=np.int32)
        rms = np.zeros(n, dtype=np.float64)
        clip = np.zeros(n, dtype=np.float64)
        dropm = np.zeros(n, dtype=np.float64)
        codec_v = cols["codec"].to_pylist()
        # fill_null(0): a NULL declared rate must land as "no rate" (decode
        # fails sanity anyway), not as a NaN that breaks the int() cast
        sr_v = cols["sr_hz"].fill_null(0).to_numpy(zero_copy_only=False)
        for i, view in enumerate(_binary_views(cols["bytes"])):
            o, s, d, r, c, dm = audio.decode_features(view, codec_v[i], int(sr_v[i]))
            ok[i], srm[i], dur[i], rms[i], clip[i], dropm[i] = o, s, d, r, c, dm

        texts = cols["transcript"].to_pylist()
        langs, confs, ppls = textscore.score_batch(texts)  # hash+gather once
        out_t, out_n = scrub.scrub_batch(texts)

        yield pa.RecordBatch.from_arrays(
            [
                cols["clip_id"],
                cols["sr_hz"],
                cols["dur_ms"],
                cols["codec"],
                cols["transcript"],
                pa.array(ok),
                pa.array(srm),
                pa.array(dur),
                pa.array(rms),
                pa.array(clip),
                pa.array(dropm),
                pa.array(langs.tolist(), type=pa.string()),
                pa.array(confs),
                pa.array(ppls),
                pa.array(out_t, type=pa.string()),
                pa.array(out_n, type=pa.int32()),
            ],
            schema=_OUT_PA_SCHEMA,
        )


def with_fused_features(df: DataFrame) -> DataFrame:
    """(clip_id, bytes, sr_hz, dur_ms, codec, transcript) → slim feature rows
    (bytes never returns to the JVM). The scrub prescan gate runs inside the
    worker via Arrow's RE2 kernel (scrub_batch) — measured ~2 us/row, vs
    ~56 us/row for the same pattern as a JVM ``rlike`` codegen column
    (java.util.regex backtracking) and ~65 us/row for Python ``re``."""
    cols = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
    return df.select(*cols).mapInArrow(fused_features_arrow, FUSED_SCHEMA)


# ---------------------------------------------------------------------------
# payload-retaining variant (scalar pandas UDF)
# ---------------------------------------------------------------------------

FUSED_UDF_SCHEMA = T.StructType(
    [
        T.StructField("pcm_ok", T.BooleanType()),
        T.StructField("sr_meas", T.IntegerType()),
        T.StructField("dur_ms_meas", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("clip_rate", T.DoubleType()),
        T.StructField("dropout_ms", T.DoubleType()),
        T.StructField("lang", T.StringType()),
        T.StructField("lang_conf", T.FloatType()),
        T.StructField("ppl", T.DoubleType()),
        T.StructField("scrubbed_all", T.StringType()),
        T.StructField("scrub_edits_all", T.IntegerType()),
    ]
)


@F.pandas_udf(FUSED_UDF_SCHEMA)
def fused_features_udf(
    batches: Iterator[tuple[pd.Series, pd.Series, pd.Series, pd.Series]],
) -> Iterator[pd.DataFrame]:
    """Scalar-UDF form of the fused stage: same ONE JVM→Python crossing, but
    the original row — including the payload — stays JVM-side. The payload
    is serialized INTO the worker once (the decode needs the bytes anyway)
    and only the slim feature struct comes back: nothing payload-sized ever
    re-crosses Arrow or enters an exchange. Semantics are shared with the
    mapInArrow form (same functions/ helpers), pinned by
    tests/test_fused_equivalence.py."""
    from ..functions import audio, scrub, textscore

    for payload, codec, sr, transcript in batches:
        n = len(payload)
        ok = np.zeros(n, dtype=bool)
        srm = np.zeros(n, dtype=np.int32)
        dur = np.zeros(n, dtype=np.int32)
        rms = np.zeros(n, dtype=np.float64)
        clip = np.zeros(n, dtype=np.float64)
        dropm = np.zeros(n, dtype=np.float64)
        codec_v = codec.to_numpy()
        sr_v = sr.to_numpy()
        for i, raw in enumerate(payload.to_numpy()):
            o, s, d, r, c, dm = audio.decode_features(
                raw, codec_v[i], audio.declared_sr(sr_v[i])
            )
            ok[i], srm[i], dur[i], rms[i], clip[i], dropm[i] = o, s, d, r, c, dm
        texts = [t if isinstance(t, str) else None for t in transcript.to_numpy()]
        langs, confs, ppls = textscore.score_batch(texts)
        out_t, out_n = scrub.scrub_batch(texts)
        yield pd.DataFrame(
            {
                "pcm_ok": ok,
                "sr_meas": srm,
                "dur_ms_meas": dur,
                "rms": rms,
                "clip_rate": clip,
                "dropout_ms": dropm,
                "lang": langs,
                "lang_conf": confs,
                "ppl": ppls,
                "scrubbed_all": pd.array(out_t, dtype="string"),
                "scrub_edits_all": pd.array(out_n, dtype="int32"),
            }
        )


def with_fused_features_retaining(df: DataFrame) -> DataFrame:
    """Append the fused feature struct while RETAINING every input column
    (notably ``bytes``) in the JVM row — the building block of the
    zero-Exchange kept-clips path (plans/pipeline.py ``kept_clips``).
    Use when a downstream stage needs survivor payloads: the alternative —
    running the slim fused stage and semi-joining payloads back — plans a
    second scan and, once the kept set outgrows a broadcast, shuffles the
    payload column (forbidden, see plans/pipeline.py module docstring)."""
    return (
        df.withColumn(
            "_f",
            fused_features_udf(
                F.col("bytes"), F.col("codec"), F.col("sr_hz"), F.col("transcript")
            ),
        )
        .select("*", "_f.*")
        .drop("_f")
    )
