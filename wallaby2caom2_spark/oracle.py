"""Single-process pure-Python reference labeler ("the reference").

Plays exactly the role wallaby2caom2's golden ``*.expected.xml`` fixtures play
(``wallaby2caom2/tests/test_caom_gen_visit.py:112-135``): an independent,
serial, one-row-at-a-time implementation of the keep/drop cascade + scrub,
against which the distributed Spark pipeline is diffed per row (keep/drop
F1 ≥ 0.99, scrubbed-transcript equality, decoded-PCM SNR ≥ 30 dB — the
BASELINE.json per-row invariants).

It shares the *scoring models* (audio decode, langid, perplexity LM, scrub
regexes — functions/) with the pipeline, but re-implements the *decision
logic* (cascade order, thresholds, scrub gating) independently in plain
Python — the same separation the reference has between its blueprint
functions and its test harness.
"""

from __future__ import annotations

from typing import Any

from .config import DEFAULT_CONFIG, PipelineConfig
from .functions import audio, langid, perplexity, scrub


def drop_reason_from_features(
    codec: str | None,
    declared_sr: int | None,
    declared_dur: int | None,
    pcm_ok: bool,
    sr_meas: int,
    dur_meas: int,
    rms: float,
    clip_rate: float,
    dropout_ms: float,
    n_chars: int,
    rep_ratio: float,
    ppl: float,
    lang: str,
    conf: float,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> str | None:
    """The first-match-wins cascade decision, factored out so every serial
    evaluator — ``label_row`` and the fused gate pass's skip-dropped
    optimization (operators/audio_signals.py) — runs the literally-same
    comparison chain on the same computed values. NULL-tolerant like the
    codegen cascade's three-valued logic: a None comparand makes the
    sr/duration rules no-ops. Equality with the Catalyst when-chain
    (operators/cascade.py ``with_keep_drop``) is the repo's core pinned
    invariant: golden fixtures (F1 = 1.0) + the flagship's 14-column
    row-level DuckDB oracle replay at every sf."""
    t = cfg.thresholds
    if codec not in cfg.supported_codecs:
        return "codec_invalid"
    if not pcm_ok:
        return "decode_failed"
    if declared_sr is not None and sr_meas != declared_sr:
        return "sr_mismatch"
    if (
        declared_dur is not None
        and abs(dur_meas - declared_dur) > t.duration_tolerance * declared_dur
    ):
        return "duration_mismatch"
    if rms < t.min_rms:
        return "audio_silence"
    if clip_rate > t.max_clip_rate:
        return "audio_clipping"
    if dropout_ms > t.max_dropout_ms:
        return "audio_dropout"
    if n_chars < t.min_chars:
        return "too_short"
    if n_chars > t.max_chars:
        return "too_long"
    if rep_ratio > t.max_repetition_ratio:
        return "repetition"
    if ppl > t.max_perplexity:
        return "perplexity_high"
    if lang not in cfg.allowed_langs:
        return "lang_not_allowed"
    if conf < t.min_lang_conf:
        return "langid_low_conf"
    return None


def transcript_shape(transcript: str | None) -> tuple[int, float]:
    """(n_chars, rep_ratio) exactly as the labeler computes them —
    ``str.split()`` tokenization, matched by the codegen ``(?U)\\S+``
    extraction (see operators/cascade.py ``with_transcript_stats``)."""
    n_chars = len(transcript) if transcript is not None else 0
    words = transcript.split() if transcript else []
    rep_ratio = 1.0 - (len(set(words)) / len(words)) if words else 0.0
    return n_chars, rep_ratio


def label_row(row: dict[str, Any], cfg: PipelineConfig = DEFAULT_CONFIG) -> dict[str, Any]:
    payload, codec = row["bytes"], row["codec"]
    # NULL-tolerant declared metadata, mirroring the cascade's SQL
    # three-valued logic: a NULL comparand makes the sr/duration rules
    # no-ops (the when-branch is skipped), it never crashes the labeler
    declared_sr = int(row["sr_hz"]) if row["sr_hz"] is not None else None
    declared_dur = int(row["dur_ms"]) if row["dur_ms"] is not None else None
    transcript = row["transcript"]

    pcm_ok, sr_meas, dur_meas, rms, clip_rate, dropout_ms = audio.decode_features(
        payload, codec, declared_sr or 0
    )
    lang, conf = langid.predict_one(transcript)
    ppl = perplexity.perplexity_one(transcript)
    n_chars, rep_ratio = transcript_shape(transcript)

    drop_reason = drop_reason_from_features(
        codec, declared_sr, declared_dur, pcm_ok, sr_meas, dur_meas,
        rms, clip_rate, dropout_ms, n_chars, rep_ratio, ppl, lang, conf,
        cfg,
    )
    keep = drop_reason is None
    scrubbed, edits = scrub.scrub_one(transcript) if keep else (None, 0)
    return {
        "clip_id": row["clip_id"],
        "keep": keep,
        "drop_reason": drop_reason,
        "scrubbed_transcript": scrubbed,
        "scrub_edits": edits,
        "lang": lang,
        "lang_conf": conf,
        "ppl": ppl,
        "pcm_ok": pcm_ok,
        "sr_meas": sr_meas,
        "dur_ms_meas": dur_meas,
        "rms": rms,
        "clip_rate": clip_rate,
        "dropout_ms": dropout_ms,
    }


def label_rows(rows, cfg: PipelineConfig = DEFAULT_CONFIG) -> list[dict[str, Any]]:
    return [label_row(r, cfg) for r in rows]
