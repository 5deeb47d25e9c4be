"""Shared pure-numpy model/codec functions.

These modules are imported BOTH by the Spark pandas-UDF stages
(operators/) and by the single-process oracle labeler (oracle.py) that
plays the role of the reference's golden ``*.expected.xml`` fixtures
(``wallaby2caom2/tests/test_caom_gen_visit.py:87-135``) — guaranteeing the
per-row invariants (decoded-PCM allclose, transcript equality) are checked
against an independent execution path, not against the pipeline itself.
"""
