"""Oracle-replay fixtures: per-clip operator outputs computed in PURE
PYTHON (no Spark) from the cached clips parquet.

The driver's correctness gate can only hash-check what DuckDB can compute.
The binary clips pipeline is not SQL-expressible — but its per-clip outputs
ARE deterministic functions of the payload, computed by the same shared
helpers the golden labeler uses (functions/audio.py, functions/langid.py,
operators/vad.py, …). Persisting those outputs once per scale factor lets
DuckDB replay every downstream classification/aggregation exactly, which
upgrades the clips queries from the driver's weak rows-only check to the
full rows+schema+value-hash check. Same trust model as the committed golden
fixtures (tests/data/golden_labels.jsonl), and the same role as the
reference's ``*.expected.xml`` files (wallaby2caom2/tests/data/**) — an
independently-computed expected table.

Bit-compatibility is exact, not approximate: the pipeline's UDFs and this
builder call the same functions on the same bytes, so even raw doubles
(ppl, rms) hash identically (verified per field in tests/test_fixtures.py).

Generation parallelizes over part files with a process pool; the output is
written to a temp dir and atomically renamed (same concurrency contract as
the clips cache).
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        # quality-filter result columns (oracle.label_row — the labeler)
        ("keep", pa.bool_()),
        ("drop_reason", pa.string()),
        ("scrubbed_transcript", pa.string()),
        ("scrub_edits", pa.int32()),
        ("lang", pa.string()),
        ("lang_conf", pa.float32()),
        ("ppl", pa.float64()),
        ("pcm_ok", pa.bool_()),
        ("sr_meas", pa.int32()),
        ("dur_ms_meas", pa.int32()),
        ("rms", pa.float64()),
        ("clip_rate", pa.float64()),
        ("dropout_ms", pa.float64()),
        # transcript length (speaking-rate gate input)
        ("n_chars", pa.int32()),
        # VAD stats (operators/vad.py helpers, UDF rounding applied)
        ("vad_ok", pa.bool_()),
        ("n_frames", pa.int32()),
        ("n_speech_frames", pa.int32()),
        ("speech_ratio", pa.float64()),
        ("n_speech_runs", pa.int32()),
        ("snr_db", pa.float64()),
        # content fingerprint (operators/audio_fp.py rule)
        ("fp_ok", pa.bool_()),
        ("fp", pa.int64()),
        # waveform preview (operators/preview.py)
        ("prev_ok", pa.bool_()),
        ("thumb_len", pa.int32()),
        ("thumb_name", pa.string()),
    ]
)


def _fixture_chunk(args: tuple[str, str]) -> str:
    """One clips part file → one fixture part file (process-pool unit)."""
    part, out_part = args
    from .functions import audio
    from .functions.preview import THUMB_W, waveform_thumbnail
    from .operators.vad import _clip_vad
    from .oracle import label_row

    t = pq.read_table(part)
    rows = t.to_pylist()
    cols: dict[str, list] = {f.name: [] for f in FIXTURE_SCHEMA}
    for row in rows:
        lab = label_row(row)
        for k, v in lab.items():
            if k in cols:
                cols[k].append(v)
        transcript = row["transcript"]
        cols["n_chars"].append(len(transcript) if transcript is not None else 0)

        raw, codec = row["bytes"], row["codec"]
        sr_d = audio.declared_sr(row["sr_hz"])
        # VAD (operators/vad.py containment rule + UDF rounding)
        x16, sr_meas_i = audio.decode_clip_i16(raw, codec)
        sr_i = (sr_meas_i or sr_d) if x16 is not None else 0
        if x16 is not None and len(x16) > 0 and sr_i > 0:
            vad_ok = True
            nf, nsp, runs, snr = _clip_vad(x16, sr_i, 20, 10, 10.0)
        else:
            vad_ok, nf, nsp, runs, snr = False, 0, 0, 0, 0.0
        ratio = (nsp / nf) if nf > 0 else 0.0
        cols["vad_ok"].append(vad_ok)
        cols["n_frames"].append(int(nf))
        cols["n_speech_frames"].append(int(nsp))
        cols["speech_ratio"].append(float(np.round(ratio + 1e-12, 6)))
        cols["n_speech_runs"].append(int(runs))
        cols["snr_db"].append(float(np.round(snr + 1e-9, 3)))

        # fingerprint (operators/audio_fp.py fingerprint_udf rule: measured
        # rate wins; rateless clips are gated)
        samples, sr_meas_f = audio.decode_clip(raw, codec)
        sr_f = sr_meas_f or sr_d
        if sr_f <= 0:
            fp_ok, fp = False, 0
        else:
            fp_ok, fp = audio.band_fingerprint(samples, sr_f)
        cols["fp_ok"].append(bool(fp_ok))
        cols["fp"].append(int(fp))

        # waveform preview (operators/preview.py)
        png = waveform_thumbnail(samples)
        cols["prev_ok"].append(png is not None)
        cols["thumb_len"].append(len(png) if png is not None else 0)
        cols["thumb_name"].append(f"{row['clip_id']}_prev_{THUMB_W}.png")

    arrays = [
        pa.array(cols[f.name], f.type) for f in FIXTURE_SCHEMA
    ]
    pq.write_table(
        pa.table(dict(zip(FIXTURE_SCHEMA.names, arrays))), out_part
    )
    return out_part


def build_features_fixture(
    clips_path: str, out_path: str, workers: int = 8
) -> str:
    """Generate the fixture table for every part file of ``clips_path``
    into ``out_path`` (atomic rename, losers discard)."""
    marker = os.path.join(out_path, "_SUCCESS_GEN")
    if os.path.exists(marker):
        return out_path
    parts = sorted(glob.glob(os.path.join(clips_path, "*.parquet")))
    tmp = f"{out_path}.gen-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    jobs = [
        (part, os.path.join(tmp, f"part-{i:05d}.parquet"))
        for i, part in enumerate(parts)
    ]
    if workers > 1 and len(jobs) > 1:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=workers) as pool:
            list(pool.map(_fixture_chunk, jobs))
    else:
        for job in jobs:
            _fixture_chunk(job)
    with open(os.path.join(tmp, "_SUCCESS_GEN"), "w") as fh:
        fh.write("ok")
    try:
        os.rename(tmp, out_path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out_path
