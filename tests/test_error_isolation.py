"""Error-isolation contract (§2.8): pathological rows never fail the job —
the reference wraps every item in try/except and logs the failure
(``wallaby2caom2/main_app.py:256-263``); here bad payloads become
``pcm_ok=false`` / drop rows and the job always completes."""

from __future__ import annotations

from pyspark.sql import functions as F

from wallaby2caom2_spark.plans.pipeline import quality_filter
from wallaby2caom2_spark.sources.clips import CLIPS_SCHEMA


def test_pathological_rows_flow_through(spark):
    rows = [
        ("null_bytes", None, 16000, 500, "wav", "a perfectly normal sentence here"),
        ("null_transcript", b"\x00\x01", 16000, 500, "pcm_s16le", None),
        ("empty_everything", b"", 0, 0, "", ""),
        ("garbage_codec", b"RIFFxxxx", 16000, 500, "mp9", "hello world again"),
        ("neg_duration", b"\x00\x00" * 100, 8000, -5, "pcm_s16le", "short text ok"),
    ]
    df = spark.createDataFrame(rows, schema=CLIPS_SCHEMA)
    out = {r["clip_id"]: r for r in quality_filter(df).collect()}
    assert len(out) == 5  # every row survived the job
    assert not out["null_bytes"]["pcm_ok"]
    assert out["null_bytes"]["drop_reason"] == "decode_failed"
    assert out["garbage_codec"]["drop_reason"] == "codec_invalid"
    assert out["empty_everything"]["drop_reason"] == "codec_invalid"
    # null transcript: audio decodes, text rules drop it (too_short via 0 chars)
    assert out["null_transcript"]["keep"] is False
    for r in out.values():
        assert r["keep"] is False  # none of these should pass
        assert r["scrubbed_transcript"] is None


def test_null_fields_are_contained(spark):
    """Poison rows with NULL transcript/bytes/codec flow through the full
    pipeline with a drop reason — never an exception (north rule: one bad
    row must not fail a 10^9-row batch)."""
    import numpy as np

    from wallaby2caom2_spark.functions import audio
    from wallaby2caom2_spark.plans.pipeline import quality_filter

    t = np.arange(16000) / 16000.0
    good = audio.encode_wav(
        (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), 16000
    )
    rows = [
        ("null-transcript", good, 16000, 1000, "wav", None),
        ("null-bytes", None, 16000, 1000, "wav", "transcript, no audio"),
        ("null-codec", good, 16000, 1000, None, "transcript, null codec"),
    ]
    df = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    out = {
        r["clip_id"]: (r["keep"], r["drop_reason"])
        for r in quality_filter(df).collect()
    }
    assert len(out) == 3  # every poison row produced a decision
    assert out["null-transcript"] == (False, "too_short")
    assert out["null-bytes"] == (False, "decode_failed")
    # NULL codec is codec_invalid (the oracle's label — `None not in
    # supported_codecs` is True); it previously fell through to
    # decode_failed because ~isin() is NULL for a NULL input
    assert out["null-codec"] == (False, "codec_invalid")
