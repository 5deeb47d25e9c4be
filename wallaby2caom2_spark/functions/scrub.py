"""Compiled-regex PII / toxicity scrub table.

Direct analog of the reference's declarative value-repair cache
(``wallaby2caom2/main_app.py:84-96``: a nested dict of attribute-path →
{bad value → good value}, applied once per record at ``main_app.py:253``).
Here the table is a flat ordered list of (compiled pattern → replacement
token); application order matters and is part of the contract.

Shared by the Spark scrub stage (operators/scrub_stage.py, patterns compiled
once per executor worker at import) and the oracle labeler.
"""

from __future__ import annotations

import re

# Order matters: SSN before PHONE (an SSN is also phone-shaped), EMAIL early
# (emails contain digit runs). First-listed wins on overlapping spans because
# earlier passes rewrite the text the later ones see.
SCRUB_TABLE: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    (r"\b(?:\+?1[-. ]?)?(?:\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
    (r"\b\d(?:[ -]?\d){12,15}\b", "[CARD]"),
    (r"\b(?:damnwort|frakking|scuzzbucket|gorramit)\b", "[TOXIC]"),  # synthetic lexicon
)

_COMPILED: tuple[tuple[re.Pattern[str], str], ...] = tuple(
    (re.compile(p, re.IGNORECASE), r) for p, r in SCRUB_TABLE
)


def scrub_one(text: str | None) -> tuple[str | None, int]:
    """→ (scrubbed text, edit count). None passes through untouched."""
    if text is None:
        return None, 0
    edits = 0
    for pat, rep in _COMPILED:
        text, n = pat.subn(rep, text)
        edits += n
    return text, edits


def scrub_batch(texts: list[str | None]) -> tuple[list[str | None], list[int]]:
    out_t: list[str | None] = []
    out_n: list[int] = []
    for t in texts:
        s, n = scrub_one(t)
        out_t.append(s)
        out_n.append(n)
    return out_t, out_n
