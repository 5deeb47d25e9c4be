"""Audio-content fingerprint + LSH-banded near-dup join.

The audio analog of the text SimHash/MinHash dedup family
(queries/dedup.py): identify re-delivered or re-encoded copies of the same
recording by CONTENT, independent of ``clip_id``. Reference analog: the
store-if-newer / known-rejected gating (``README.md:39-41``,
``config/config.yml:56-60``) keys work off identity, not name.

Scale shape (the part that must survive 100 TB):

- fingerprint extraction is one Arrow-batched pandas UDF over ``bytes``
  (same crossing budget as the decode stage; the payload dies in the
  worker — only an int64 leaves);
- candidate generation is NOT all-pairs: the 60-bit fingerprint is split
  into 4 15-bit bands and near-dups (hamming ≤ 3 across 60 bits) must
  collide on ≥1 whole band → equi-join on ``(band_idx, band_bits)``,
  identical to the text LSH banding;
- verification is JVM-side ``bit_count(fp_a ^ fp_b)`` — no Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import audio

N_BANDS = 4
BAND_BITS = 15  # 4 x 15 = 60 fingerprint bits

FP_SCHEMA = T.StructType(
    [
        T.StructField("fp_ok", T.BooleanType()),
        T.StructField("fp", T.LongType()),
    ]
)


@F.pandas_udf(FP_SCHEMA)
def fingerprint_udf(
    batches: Iterator[tuple[pd.Series, pd.Series, pd.Series]],
) -> Iterator[pd.DataFrame]:
    """(bytes, codec, sr_hz) → (fp_ok, fp). Undecodable / too-short payloads
    yield ``fp_ok=false`` and flow on (error containment, never fail the
    batch). The measured rate (container header) wins over the declared
    column; either way the signal is decimated to the fixed analysis rate
    inside ``band_fingerprint`` — sample-rate-invariant identity."""
    for payload, codec, sr in batches:
        n = len(payload)
        ok = np.zeros(n, dtype=bool)
        fps = np.zeros(n, dtype=np.int64)
        codec_v = codec.to_numpy()
        sr_v = sr.to_numpy()
        for i, raw in enumerate(payload.to_numpy()):
            samples, sr_meas = audio.decode_clip(
                bytes(raw) if raw is not None else None, codec_v[i]
            )
            sr_eff = sr_meas or audio.declared_sr(sr_v[i])
            if sr_eff <= 0:
                # rateless clip: no resample to the fixed analysis rate is
                # possible, so the fingerprint would be rate-VARIANT. Gate
                # it out — the same decision the fused audio_signals pass
                # makes (sig_ok=false), keeping the two operators
                # interchangeable as documented.
                continue
            o, f = audio.band_fingerprint(samples, sr_eff)
            ok[i], fps[i] = o, f
        yield pd.DataFrame({"fp_ok": ok, "fp": fps})


def with_fingerprint(df: DataFrame) -> DataFrame:
    """Append ``fp_ok``/``fp``; keeps every row (containment stage)."""
    return (
        df.withColumn(
            "_fp",
            fingerprint_udf(F.col("bytes"), F.col("codec"), F.col("sr_hz")),
        )
        .select("*", "_fp.*")
        .drop("_fp")
    )


def explode_bands(fp_df: DataFrame) -> DataFrame:
    """(clip_id, fp_ok, fp) → one slim row per nonzero 15-bit band:
    (clip_id, fp, band_idx, band_bits). The all-zero band value is dropped:
    gated (near-silent) segments emit 15 deterministic zero bits, so every
    clip with a silent segment at the same position would land in ONE
    (band_idx, 0) bucket — a quadratic hot key on any downstream equi-join
    at corpus scale. Cost: a pair whose only equal band is the degenerate
    zero band is missed — acceptable, since an all-quiet band carries no
    content identity to match on. Shared by the in-corpus pair join and the
    incremental new-batch-vs-store match, so the hot-key policy cannot
    drift between them."""
    base = fp_df.filter(F.col("fp_ok")).select("clip_id", "fp")
    bands = base.select(
        "clip_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        (
                            F.shiftright(F.col("fp"), i * BAND_BITS)
                            % F.lit(1 << BAND_BITS)
                        ).alias("band_bits"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("clip_id", "fp", "b.band_idx", "b.band_bits")
    return bands.filter(F.col("band_bits") != 0)


def banded_neardup_pairs(
    fp_df: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Near-dup clip pairs via LSH banding over the 60-bit fingerprint.

    Input needs columns ``clip_id, fp_ok, fp``. Pairs within hamming
    ``max_hamming`` are found by exploding each fingerprint into 4
    ``(band_idx, band_bits)`` keys, equi-joining on the band key, then
    verifying the full hamming distance with JVM ``bit_count`` — all
    codegen after the one UDF stage.

    Recall guarantee (qualified): hamming ≤ 3 across 60 bits must leave at
    least one of the 4 bands untouched (pigeonhole), BUT the hot-key filter
    in ``explode_bands`` drops the all-zero band value — so a true near-dup pair whose
    ONLY untouched band encodes exactly 0 (a gated silent segment, or a
    live segment whose 15 comparisons all came out false) is missed. This
    is deliberate: a zero band is either silence (no content identity to
    match on) or a degenerate monotone-down spectrum shared by unrelated
    clips, and keeping it would recreate the quadratic (band_idx, 0) LSH
    hot bucket at corpus scale. Pairs with ≥1 nonzero shared band — every
    case the golden fixtures exercise — are always found.
    """
    bands = explode_bands(fp_df)
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_bits") == F.col("r.band_bits"))
            & (F.col("l.clip_id") < F.col("r.clip_id")),
        )
        .select(
            F.col("l.clip_id").alias("clip_a"),
            F.col("r.clip_id").alias("clip_b"),
            F.col("l.fp").alias("fp_a"),
            F.col("r.fp").alias("fp_b"),
        )
        .dropDuplicates(["clip_a", "clip_b"])
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return pairs.withColumn("hamming", ham.cast("int")).filter(
        F.col("hamming") <= max_hamming
    )


def incremental_matches(
    new_fp: DataFrame, store_fp: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Day-2 ingest dedup: best store match per NEW clip, via the banded
    equi-join of the new batch's fingerprints against a PERSISTED corpus
    signature store.

    This is the incremental form of ``banded_neardup_pairs``: instead of
    pairing a corpus against itself (day-0 backfill), each ingest batch is
    fingerprinted once and probed against the signature table the previous
    runs wrote — the O(batch) work a 10^12-clip corpus requires, never a
    re-pair of the whole corpus. Inputs are (clip_id, fp_ok, fp) frames;
    only these ~16-byte rows participate, payloads never enter the plan.

    Scale shape: both sides explode to (band_idx, band_bits) keys with the
    shared zero-band hot-key policy (``explode_bands``) and equi-join on
    the band key. The store side is the big one (corpus-sized, read from
    its own table — at scale, bucketed by band key so the probe is a
    co-located join); the batch side is a day's ingest. The hamming verify
    and the best-match reduction (min hamming, then min store id for a
    deterministic tiebreak) are codegen. Returns one row per matched new
    clip: (clip_id, match_id, hamming).

    Reference analog: store-if-newer / read-existing-before-write
    (``wallaby2caom2/composable.py`` read-modify-write per record) — the
    "does the corpus already have this content" probe, batched.
    """
    nb = explode_bands(new_fp).alias("n")
    sb = explode_bands(store_fp).alias("s")
    cand = (
        nb.join(
            sb,
            (F.col("n.band_idx") == F.col("s.band_idx"))
            & (F.col("n.band_bits") == F.col("s.band_bits")),
        )
        .select(
            F.col("n.clip_id").alias("clip_id"),
            F.col("s.clip_id").alias("match_id"),
            F.col("n.fp").alias("fp_n"),
            F.col("s.fp").alias("fp_s"),
        )
        .dropDuplicates(["clip_id", "match_id"])
    )
    ham = F.bit_count(F.col("fp_n").bitwiseXOR(F.col("fp_s"))).cast("int")
    verified = cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    )
    # best match per new clip: min (hamming, match_id) — deterministic
    best = verified.groupBy("clip_id").agg(
        F.min(F.struct("hamming", "match_id")).alias("_b")
    )
    return best.select(
        "clip_id",
        F.col("_b.match_id").alias("match_id"),
        F.col("_b.hamming").alias("hamming"),
    )
