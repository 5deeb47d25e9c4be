"""Langid + perplexity unit tests with literal expected values — the
test_storage_name.py style (``wallaby2caom2/tests/test_storage_name.py:74-209``:
input → derived-field literal dicts)."""

from __future__ import annotations

import numpy as np

from wallaby2caom2_spark.config import DEFAULT_CONFIG
from wallaby2caom2_spark.datagen import _BANK
from wallaby2caom2_spark.functions import langid, perplexity

T = DEFAULT_CONFIG.thresholds

EXPECTED_LANG = {
    "Every morning the children walk slowly towards the school.": "en",
    "Chaque matin les enfants marchent lentement vers une ecole.": "fr",
    "Jeden Morgen gehen die Kinder langsam zur Schule.": "de",
    "Cada manana los ninos caminan despacio hacia la escuela.": "es",
    "Ogni mattina i bambini camminano lentamente verso la scuola.": "it",
}


def test_literal_expected_langs():
    for text, lang in EXPECTED_LANG.items():
        got, conf = langid.predict_one(text)
        assert got == lang, f"{text!r}: {got} != {lang}"
        assert conf >= T.min_lang_conf


def test_empty_text_is_und():
    assert langid.predict_one(None)[0] == "und"
    assert langid.predict_one("")[0] == "und"


def test_bank_sentence_accuracy_and_confidence():
    """Calibration contract: ≥99% of clean generator sentences classify
    correctly with conf ≥ threshold."""
    rng = np.random.default_rng(123)
    total = correct = 0
    for lang, bank in _BANK.items():
        sents = [" ".join(rng.choice(bank, size=12)) for _ in range(50)]
        preds, confs = langid.predict_batch(sents)
        for p, c in zip(preds, confs):
            total += 1
            correct += p == lang and c >= T.min_lang_conf
    assert correct / total >= 0.99


def test_perplexity_separates_gibberish():
    rng = np.random.default_rng(5)
    cons = np.array(list("bcdfghjklmnpqrstvwxz"))
    clean = [" ".join(rng.choice(_BANK["en"], size=12)) for _ in range(50)]
    gib = [
        " ".join("".join(rng.choice(cons, size=7)) for _ in range(12))
        for _ in range(50)
    ]
    p_clean = perplexity.perplexity_batch(clean)
    p_gib = perplexity.perplexity_batch(gib)
    assert (p_clean <= T.max_perplexity).mean() >= 0.99
    assert (p_gib > T.max_perplexity).mean() >= 0.99


def test_batch_matches_one():
    texts = list(EXPECTED_LANG) + ["", None, "xyzzy plugh"]
    langs, confs = langid.predict_batch(texts)
    for i, t in enumerate(texts):
        l1, c1 = langid.predict_one(t)
        assert l1 == langs[i] and abs(c1 - confs[i]) < 1e-12
