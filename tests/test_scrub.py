"""Scrub table unit tests — literal (input → expected) pairs, the
reference's value-repair contract style (``wallaby2caom2/main_app.py:84-96``)."""

from wallaby2caom2_spark.functions.scrub import scrub_one

EXPECTED = {
    "contact me at jane.doe@example.com please": (
        "contact me at [EMAIL] please",
        1,
    ),
    "my number is 555-123-4567 call anytime": (
        "my number is [PHONE] call anytime",
        1,
    ),
    "ssn on file 123-45-6789 for verification": (
        "ssn on file [SSN] for verification",
        1,
    ),
    "card 4111 1111 1111 1111 expires soon": ("card [CARD] expires soon", 1),
    "that frakking printer broke again": ("that [TOXIC] printer broke again", 1),
    "no pii here at all": ("no pii here at all", 0),
    "a@b.co and 123-45-6789 and 555-123-4567": ("[EMAIL] and [SSN] and [PHONE]", 3),
}


def test_literal_expected_scrubs():
    for text, (want, edits) in EXPECTED.items():
        got, n = scrub_one(text)
        assert got == want, f"{text!r} → {got!r}"
        assert n == edits


def test_none_passthrough():
    assert scrub_one(None) == (None, 0)


def test_ssn_wins_over_phone():
    # SSN-shaped digits must not be half-eaten by the phone pattern
    got, n = scrub_one("id 123-45-6789 ok")
    assert got == "id [SSN] ok" and n == 1


def test_overlapping_spans_leftmost_wins():
    """Contract pin: LEFTMOST match wins; listed order only breaks ties at
    equal start. '99 123-45-6789 99' is both an SSN (at pos 3) and a
    13-digit card run (at pos 0) — the earlier-starting CARD branch takes
    the whole span. The text is still fully redacted."""
    out, n = scrub_one("99 123-45-6789 99")
    assert out == "[CARD]"
    assert n == 1
    # equal-start tie: listed order (SSN before CARD-shaped continuations)
    out, n = scrub_one("ssn 123-45-6789 ok")
    assert out == "ssn [SSN] ok"
    assert n == 1
