"""The quality-filter pipeline: one lazy DataFrame DAG.

Reference lifecycle analog (SURVEY.md §3): where wallaby2caom2 runs a serial
per-item loop — name-build → store → read existing → meta visit → write →
bookkeeping (``wallaby2caom2/composable.py:115-138``) — this module declares
the same dataflow once, over all rows:

    scan → decode UDF (narrow, per input split) → DROP bytes
    → salted repartition of slim rows (the ONLY shuffle) → langid UDF
    → transcript stats (codegen) → rule cascade (codegen) → scrub UDF
    → result projection  [+ metrics aggregation as a separate action]

Ordering rationale (100 TB design): the audio payload dominates row size
(~50 KB vs ~300 B for everything else), so ``bytes`` must NEVER cross a
shuffle — decode runs as a narrow stage over the scan's own splits (parquet
splits are size-balanced by construction, so byte-level work is even without
a shuffle), and only the slim decoded+text rows are salt-repartitioned to
even out row-count work for the text stages. The three pandas UDFs are the
only JVM↔Python crossings, all Arrow-batched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators import cascade, decode, fused_stage, partitioning, text_stage

RESULT_COLUMNS = [
    "clip_id",
    "keep",
    "drop_reason",
    "scrubbed_transcript",
    "scrub_edits",
    "lang",
    "lang_conf",
    "ppl",
    "pcm_ok",
    "sr_meas",
    "dur_ms_meas",
    "rms",
    "clip_rate",
    "dropout_ms",
]


def quality_filter(
    clips: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
    repartition: bool = True,
    fused: bool = True,
) -> DataFrame:
    """clips(clip_id, bytes, sr_hz, dur_ms, codec, transcript) → result rows.

    ``fused=True`` (default): ONE mapInPandas crossing computes decode +
    text-model features per scan split (bytes die inside the worker), the
    transcript stats + rule cascade + scrub mask run in codegen on the SAME
    narrow stage, and only the final slim result rows cross the one salted
    exchange — ``transcript`` and the unmasked scrub text never shuffle
    (dropped rows carry NULL text, so the exchange moves kept-row text
    only). ``fused=False`` keeps the two-stage composition (decode →
    shuffle → text models) — same semantics, used by the composability
    tests; there the repartition must sit BEFORE the text UDFs (that path's
    skew-kill is about balancing Python work), so transcript crosses.
    Either way no payload byte ever crosses a shuffle.
    """
    n = num_partitions or clips.sparkSession.sparkContext.defaultParallelism * 2
    if fused:
        df = clips.transform(fused_stage.with_fused_features)
    else:
        df = clips.transform(decode.with_decode_features).drop("bytes")
        if repartition:
            # deterministic per-row salt: transcript alone is enough entropy
            # to split duplicate hot clip_ids, and skips re-hashing the
            # other feature columns in the exchange's hash projection
            df = partitioning.salted_repartition(df, n, content_cols=("transcript",))
        df = df.transform(text_stage.with_text_models)
    df = (
        df.transform(cascade.with_transcript_stats)
        .transform(lambda d: cascade.with_keep_drop(d, cfg))
        .transform(text_stage.mask_scrub)
        .select(*RESULT_COLUMNS)
    )
    if fused and repartition:
        # the exchange balances output rows for the sink regardless of key
        # skew / input layout; content-derived salt columns keep routing
        # deterministic across stage retries while splitting hot clip_ids
        # (ppl/rms/dur are content hashes in effect; scrubbed text covers
        # kept rows)
        df = partitioning.salted_repartition(
            df, n, content_cols=("scrubbed_transcript", "ppl", "rms", "dur_ms_meas")
        )
    return df


def kept_clips(clips: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Quality-filter survivors WITH their payloads — the zero-Exchange form.

    Downstream payload stages (segmentation, tensor extraction, trim,
    augmentation — queries/clips_flagship.py) need (bytes + keep). Joining
    payloads back to the slim filter output (``clips ⋈ kept_ids`` left-semi)
    reads the corpus twice and, once the kept set outgrows a broadcast
    (~50% of 10^12 rows), plans a sort-merge join that shuffles the ~50 KB
    payload column — violating this module's "bytes never cross a shuffle"
    contract. Instead the keep decision is recomputed NARROWLY: the fused
    feature struct is attached by a scalar pandas UDF (payload stays in the
    JVM row), the cascade runs in codegen, and the filter prunes in place —
    scan → UDF → filter, ONE scan, ZERO exchanges of any kind. Pinned by
    tests/test_plan_shapes.py (no Exchange carries a payload column) and
    tests/test_fused_equivalence.py (same kept set as ``quality_filter``).
    """
    labeled = (
        clips.transform(fused_stage.with_fused_features_retaining)
        .transform(cascade.with_transcript_stats)
        .transform(lambda d: cascade.with_keep_drop(d, cfg))
    )
    return labeled.filter(F.col("keep")).select(*clips.columns)


def run_metrics(result: DataFrame, extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """North-rule counters: clips seen / kept / dropped-by-rule / scrub edits.

    Reference analog: success/failure/progress logs + metrics directory
    (``config/config.yml:28-54``). One tiny hash aggregation; input columns
    are 3 narrow ones, so the scan never touches transcripts or bytes.
    ``extra_keys`` adds grouping columns (the wave runner passes
    ``("bucket",)`` so its metrics sink can overwrite per bucket on
    crash-resume instead of double-counting).
    """
    return (
        result.groupBy(
            *extra_keys,
            F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("outcome"),
        )
        .agg(
            F.count("*").alias("clips"),
            F.sum("scrub_edits").alias("scrub_edits"),
        )
        .withColumn("kept", F.col("outcome") == "kept")
    )
