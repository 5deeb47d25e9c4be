"""Property-based invariants (hypothesis) for the pure function layer.

Goes beyond the reference's fixture style (SURVEY.md §5: no property tests
there) because these functions run on 10^12 arbitrary payloads: the codec
round-trip, the scrub pass, and the fingerprint must hold their contracts on
ANY input, not just the golden corpus.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from wallaby2caom2_spark.functions import audio
from wallaby2caom2_spark.functions.scrub import scrub_one

_signals = arrays(
    np.float32,
    st.integers(min_value=0, max_value=4096),
    elements=st.floats(
        min_value=-1.0, max_value=1.0, width=32, allow_nan=False
    ),
)


@settings(max_examples=50, deadline=None)
@given(_signals, st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_is_quantization_exact(samples, sr):
    dec, sr_meas = audio.decode_clip(audio.encode_wav(samples, sr), "wav")
    assert sr_meas == sr
    assert len(dec) == len(samples)
    if len(samples):
        assert np.max(np.abs(dec - samples)) <= 1.0 / 32767.0 + 1e-7


@settings(max_examples=50, deadline=None)
@given(
    arrays(
        np.float32,
        st.integers(min_value=1, max_value=4096),
        elements=st.floats(
            min_value=-1.0, max_value=1.0, width=32, allow_nan=False
        ),
    )
)
def test_pcm_roundtrip_matches_wav_payload(samples):
    # zero-length raw PCM is (None, 0) by contract — an empty payload is
    # indistinguishable from a truncated one without a container header
    via_pcm, _ = audio.decode_clip(
        audio.encode_pcm_s16le(samples), "pcm_s16le"
    )
    via_wav, _ = audio.decode_clip(audio.encode_wav(samples, 16000), "wav")
    assert np.array_equal(via_pcm, via_wav)


@settings(max_examples=30, deadline=None)
@given(st.binary(max_size=200), st.sampled_from(["wav", "flac", "pcm_s16le", "mp3"]))
def test_decode_never_raises_on_garbage(payload, codec):
    """Error containment: any byte string decodes to samples or (None, 0) —
    never an exception (one poison row must not fail a 10^9-row batch)."""
    samples, sr = audio.decode_clip(payload, codec)
    assert samples is None or isinstance(samples, np.ndarray)
    assert isinstance(sr, int)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_scrub_is_idempotent_and_counts_edits(text):
    t1, e1 = scrub_one(text)
    t2, e2 = scrub_one(t1)
    assert t2 == t1  # a scrubbed transcript is a fixed point
    assert e2 == 0
    assert e1 >= 0
    if e1 == 0:
        assert t1 == text  # zero edits => byte-identical passthrough


@settings(max_examples=30, deadline=None)
@given(
    arrays(
        np.float32,
        st.integers(min_value=256, max_value=4096),
        elements=st.floats(
            min_value=-0.875, max_value=0.875, width=32, allow_nan=False
        ),
    ),
    st.floats(min_value=0.25, max_value=1.0),
)
def test_fingerprint_gain_invariant_property(samples, gain):
    """Over the REAL input domain — decoded int16 audio (hypothesis found
    that raw float32 with subnormal samples underflows to zero under gain,
    which no int16-decoded signal can do; min nonzero step is 1/32767).

    The operator contract is hamming-NEAR for re-levelled copies, exact
    only for byte-identical payloads (test_audio_fp pins that): bits whose
    band-energy ratio sits at the decision margin may flip under the float
    noise a gain multiply introduces. The bound applies when every segment
    carries real AC content — contentless segments are deterministically
    zero-bit by design, and signals at the quantization floor legitimately
    lose identity to requantization noise."""
    q, _ = audio.decode_clip(audio.encode_pcm_s16le(samples), "pcm_s16le")
    ok1, f1 = audio.band_fingerprint(q)
    seg_len = len(q) // 4
    seg_rms = [
        float(np.std(q[s * seg_len : (s + 1) * seg_len].astype(np.float64)))
        for s in range(4)
    ]
    contentful = min(seg_rms) * gain >= 1e-3
    # pure re-levelling (float gain, no requantization)
    ok2, f2 = audio.band_fingerprint(q * np.float32(gain))
    if ok1 and ok2 and contentful:
        assert bin(f1 ^ f2).count("1") <= 6
    # re-levelled AND re-quantized copy (the realistic re-encode)
    rq, _ = audio.decode_clip(
        audio.encode_pcm_s16le(q * np.float32(gain)), "pcm_s16le"
    )
    ok3, f3 = audio.band_fingerprint(rq)
    if ok1 and ok3 and contentful and float(np.std(q)) * gain >= 3e-3:
        assert bin(f1 ^ f3).count("1") <= 12


@settings(max_examples=30, deadline=None)
@given(
    arrays(
        np.float32,
        st.integers(min_value=0, max_value=2048),
        elements=st.floats(
            min_value=-1.0, max_value=1.0, width=32, allow_nan=False
        ),
    ),
    st.sampled_from([(8000, 16000), (16000, 8000), (44100, 16000)]),
)
def test_resample_length_and_range(samples, rates):
    sr_in, sr_out = rates
    out = audio.resample_linear(samples, sr_in, sr_out)
    assert len(out) == int(round(len(samples) * sr_out / sr_in)) or len(samples) == 0
    if len(out):
        # interpolation never exceeds the input envelope
        assert out.max() <= samples.max() + 1e-6
        assert out.min() >= samples.min() - 1e-6


@settings(max_examples=50, deadline=None)
@given(
    arrays(
        np.int16,
        st.integers(min_value=0, max_value=8192),
        elements=st.integers(min_value=-32768, max_value=32767),
    ),
    st.sampled_from([8000, 16000]),
    st.floats(min_value=3.0, max_value=20.0),
)
def test_vad_invariants(samples, sr, gate_db):
    """Structural invariants of the energy VAD on ANY int16 signal:
    speech frames bounded by total frames, runs bounded by speech frames
    (and by ceil(frames/2), the max alternation), SNR in [0, 99], and
    full determinism."""
    from wallaby2caom2_spark.operators.vad import _clip_vad

    n_frames, n_speech, n_runs, snr = _clip_vad(samples, sr, 20, 10, gate_db)
    assert 0 <= n_speech <= n_frames
    assert 0 <= n_runs <= n_speech
    assert n_runs <= (n_frames + 1) // 2
    assert 0.0 <= snr <= 99.0
    if n_speech == 0:
        assert n_runs == 0 and snr == 0.0
    assert _clip_vad(samples, sr, 20, 10, gate_db) == (
        n_frames, n_speech, n_runs, snr,
    )


@settings(max_examples=30, deadline=None)
@given(
    arrays(
        np.float32,
        st.integers(min_value=16, max_value=4096),
        elements=st.floats(min_value=-1.0, max_value=1.0, width=32,
                           allow_nan=False),
    ),
    st.sampled_from([0.8, 0.9, 1.1, 1.25]),
)
def test_speed_perturb_duration_scaling(samples, factor):
    """Speed factor f scales sample count by ~1/f (rounding), preserves
    the rate, and the output decodes cleanly."""
    from wallaby2caom2_spark.functions import audio

    sr = 16000
    y = audio.resample_linear(samples, int(round(sr * factor)), sr)
    expect = len(samples) * sr / (sr * factor)
    assert abs(len(y) - expect) <= 1 + expect * 1e-3
    wav = audio.encode_wav(y, sr)
    dec, sr_meas = audio.decode_clip(wav, "wav")
    assert sr_meas == sr and len(dec) == len(y)


@settings(max_examples=50, deadline=None)
@given(_signals, st.sampled_from([7, 800, 4000, 16000, 48000]))
def test_spectrum_never_raises_and_is_bounded(samples, sr):
    """_clip_spectrum must hold its contract on ANY signal at ANY declared
    rate (including absurd ones): return None or three bounded floats —
    flatness in (0,1], peak share in (0,1], centroid within Nyquist."""
    from wallaby2caom2_spark.operators.spectral import _ANALYSIS_SR, _clip_spectrum

    res = _clip_spectrum(samples, sr)
    if res is None:
        return
    flat, centroid, peak = res
    assert 0.0 < flat <= 1.0 + 1e-9
    assert 0.0 < peak <= 1.0 + 1e-9
    assert 0.0 <= centroid <= min(sr, _ANALYSIS_SR) / 2.0 + 1e-6


@settings(max_examples=30, deadline=None)
@given(
    arrays(
        np.float32,
        st.integers(min_value=256, max_value=4096),
        elements=st.floats(
            min_value=-0.5, max_value=0.5, width=32, allow_nan=False
        ),
    ),
    st.sampled_from([0.25, 0.5, 2.0, 4.0]),
)
def test_spectrum_flatness_is_gain_invariant(samples, gain):
    """Scaling the signal must not change the tonality verdict: flatness
    and peak share are ratios of band powers, so any gain cancels."""
    from wallaby2caom2_spark.operators.spectral import _clip_spectrum

    a = _clip_spectrum(samples, 4000)
    b = _clip_spectrum((samples * gain).astype(np.float32), 4000)
    if a is None or b is None:
        # the quiet side may drop below the power floor — that's the gate
        # working, not a contract violation
        return
    assert abs(a[0] - b[0]) < 5e-3  # flatness
    assert abs(a[2] - b[2]) < 5e-3  # peak share


@settings(max_examples=100, deadline=None)
@given(
    arrays(
        np.int16,
        st.integers(min_value=0, max_value=400),
        elements=st.integers(min_value=-32768, max_value=32767),
    )
)
def test_longest_quiet_run_matches_naive(x):
    """Vectorized run-length (functions/audio._longest_quiet_run) agrees
    with the obvious per-sample loop on arbitrary int16 signals."""
    from wallaby2caom2_spark.functions import audio

    best = cur = 0
    for v in x.tolist():
        if -audio._DROPOUT_AMP < v < audio._DROPOUT_AMP:
            cur += 1
            best = max(best, cur)
        else:
            cur = 0
    assert audio._longest_quiet_run(x) == best


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"
            ),
            max_size=12,
        ),
        max_size=8,
    )
)
def test_transcript_tokens_match_python_split(spark, parts):
    """The cascade's (?U)\\S+ tokenizer equals str.split() on arbitrary
    text, including unicode whitespace — the oracle-parity contract
    (skipping the U+001C-1F family Python splits on but Unicode does not
    class as whitespace)."""
    from wallaby2caom2_spark.operators import cascade

    text = " ".join(parts)
    if any(0x1C <= ord(c) <= 0x1F or c in "\x0b\x0c\x85" for c in text):
        return  # documented corner: Python-only whitespace
    # several variants per hypothesis example — one Spark job each example,
    # not one per string
    variants = [text, " " + text, text + "\n", "\t" + text + "  "]
    df = spark.createDataFrame(
        [(v,) for v in variants], "transcript string"
    )
    rows = cascade.with_transcript_stats(df).collect()
    for r in rows:
        py = r["transcript"].split()
        assert r["n_words"] == len(py), r["transcript"]
        assert r["n_distinct_words"] == len(set(py)), r["transcript"]


# ---- image codecs (functions/png.py, functions/jpeg.py) ----

_png_images = st.tuples(
    st.integers(min_value=1, max_value=24),  # h
    st.integers(min_value=1, max_value=24),  # w
    st.sampled_from([1, 3, 4]),  # channels
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    st.integers(min_value=0, max_value=2**32 - 1),  # filter seed
)


@settings(max_examples=60, deadline=None)
@given(_png_images)
def test_png_roundtrip_exact_any_shape_filter_mix(spec):
    """PNG is lossless: encode(img, any per-row filter mix) must decode to
    the identical array for every shape and color type."""
    from wallaby2caom2_spark.functions.png import decode_png, encode_png

    h, w, ch, pxseed, fseed = spec
    rng = np.random.default_rng(pxseed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    filters = np.random.default_rng(fseed).integers(0, 5, size=h).tolist()
    out = decode_png(encode_png(img, filters=filters))
    assert out is not None and out.shape == img.shape
    assert (out == img).all()


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_png_decode_never_raises_on_garbage(payload):
    """Containment: arbitrary bytes (including a valid signature prefix)
    must yield None, never an exception."""
    from wallaby2caom2_spark.functions.png import _PNG_SIG, decode_png

    assert decode_png(payload) is None or payload[:8] == _PNG_SIG
    decode_png(_PNG_SIG + payload)  # must not raise


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=4),  # block rows
    st.integers(min_value=1, max_value=4),  # block cols
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_jpeg_block_constant_roundtrip_exact(bh, bw, seed):
    """The analytic-oracle law: flat quant + 8x8-block-constant pixels
    round-trip EXACTLY for any block values."""
    from wallaby2caom2_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    blocks = np.random.default_rng(seed).integers(
        0, 256, size=(bh, bw), dtype=np.int64
    )
    img = np.kron(blocks, np.ones((8, 8), np.int64)).astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(img, quant=1))
    assert out is not None and (out == img).all()


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_jpeg_flat_quant_roundtrip_within_one_lsb(h, w, seed):
    """At flat quant the only loss is FDCT/IDCT rounding: every pixel of
    every image must survive within 1 LSB (any dims, incl. partial
    blocks via edge replication)."""
    from wallaby2caom2_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8
    )
    out = decode_jpeg_gray(encode_jpeg_gray(img, quant=1))
    assert out is not None and out.shape == (h, w)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_jpeg_decode_never_raises_on_garbage(payload):
    from wallaby2caom2_spark.functions.jpeg import decode_jpeg_gray

    decode_jpeg_gray(payload)  # must not raise
    decode_jpeg_gray(b"\xff\xd8" + payload)  # valid SOI prefix: still safe


@settings(max_examples=25, deadline=None)
@given(
    arrays(
        np.float32,
        st.integers(min_value=8000, max_value=24000),
        elements=st.floats(
            min_value=-0.0625,
            max_value=0.0625,
            width=32,
            allow_nan=False,
            allow_subnormal=False,
        ),
    ),
    st.sampled_from([0.1, 0.5, 2.0, 8.0]),
)
def test_loudness_gain_shift_law(samples, gain):
    """The defining loudness property: scaling a signal by g shifts the
    K-weighted level by exactly 20·log10(g) — UNLESS the shift moves
    blocks across a gate (the gates are level-dependent by design), which
    on heterogeneous signals can bend the shift by a few LU. Restrict to
    signals where every block already clears both gates on both sides
    (gated == n_blocks) so the law must hold to float tolerance."""
    from wallaby2caom2_spark.operators.loudness import clip_loudness

    a = clip_loudness(samples, 16000)
    b = clip_loudness((samples * gain).astype(np.float32), 16000)
    if a is None or b is None:
        return  # a side fell below the absolute gate entirely — contained
    la, _, na, ga, _ = a
    lb, _, nb, gb, _ = b
    assert na == nb  # block framing is amplitude-independent
    if ga == na and gb == nb:
        assert abs((lb - la) - 20.0 * np.log10(gain)) < 0.05


@settings(max_examples=25, deadline=None)
@given(
    arrays(
        np.float32,
        st.integers(min_value=2000, max_value=40000),
        elements=st.floats(
            min_value=-1.0,
            max_value=1.0,
            width=32,
            allow_nan=False,
            allow_subnormal=False,
        ),
    ),
    st.sampled_from([8000, 16000, 22050]),
)
def test_loudness_contract_on_arbitrary_signals(samples, sr):
    """clip_loudness never raises and holds its output contract on ANY
    signal: finite LUFS, peak ≤ 0 dBFS for full-scale-bounded input,
    1 ≤ gated ≤ blocks, non-negative block range."""
    from wallaby2caom2_spark.operators.loudness import clip_loudness

    res = clip_loudness(samples, sr)
    if res is None:
        return
    lufs, peak, n_blocks, n_gated, rng = res
    assert np.isfinite(lufs) and np.isfinite(peak) and np.isfinite(rng)
    assert peak <= 1e-6
    assert 1 <= n_gated <= n_blocks
    assert rng >= 0.0
