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


def label_row(row: dict[str, Any], cfg: PipelineConfig = DEFAULT_CONFIG) -> dict[str, Any]:
    t = cfg.thresholds
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
    n_chars = len(transcript) if transcript is not None else 0
    words = transcript.split() if transcript else []
    rep_ratio = 1.0 - (len(set(words)) / len(words)) if words else 0.0

    drop_reason: str | None = None
    if codec not in cfg.supported_codecs:
        drop_reason = "codec_invalid"
    elif not pcm_ok:
        drop_reason = "decode_failed"
    elif declared_sr is not None and sr_meas != declared_sr:
        drop_reason = "sr_mismatch"
    elif (
        declared_dur is not None
        and abs(dur_meas - declared_dur) > t.duration_tolerance * declared_dur
    ):
        drop_reason = "duration_mismatch"
    elif rms < t.min_rms:
        drop_reason = "audio_silence"
    elif clip_rate > t.max_clip_rate:
        drop_reason = "audio_clipping"
    elif dropout_ms > t.max_dropout_ms:
        drop_reason = "audio_dropout"
    elif n_chars < t.min_chars:
        drop_reason = "too_short"
    elif n_chars > t.max_chars:
        drop_reason = "too_long"
    elif rep_ratio > t.max_repetition_ratio:
        drop_reason = "repetition"
    elif ppl > t.max_perplexity:
        drop_reason = "perplexity_high"
    elif lang not in cfg.allowed_langs:
        drop_reason = "lang_not_allowed"
    elif conf < t.min_lang_conf:
        drop_reason = "langid_low_conf"

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
