"""Generator determinism — the property that lets us commit a generator
instead of binary fixtures (reference commits fixtures under
``wallaby2caom2/tests/data/``; we commit the seed)."""

from wallaby2caom2_spark import datagen


def test_same_seed_same_rows():
    a = list(datagen.generate_rows(50, seed=42))
    b = list(datagen.generate_rows(50, seed=42))
    assert a == b


def test_chunked_equals_whole():
    whole = list(datagen.generate_rows(60, seed=42))
    chunked = list(datagen.generate_rows(30, seed=42, start=0)) + list(
        datagen.generate_rows(30, seed=42, start=30)
    )
    assert whole == chunked


def test_different_seed_differs():
    a = list(datagen.generate_rows(20, seed=1))
    b = list(datagen.generate_rows(20, seed=2))
    assert a != b


def test_schema_and_defect_mix(clips_rows):
    assert {r["codec"] for r in clips_rows} <= {"pcm_s16le", "wav", "flac", "bad"}
    assert any(r["clip_id"].startswith("hot_") for r in clips_rows)  # skew planted
    assert any(len(r["bytes"]) == 0 for r in clips_rows)             # defect planted
