"""Spark operator stages.

Each stage is a pure ``DataFrame -> DataFrame`` function, composed with
``DataFrame.transform`` — the Spark-native analog of the reference's visitor
chain (``META_VISITORS``/``DATA_VISITORS``, ``wallaby2caom2/composable.py:87-88``,
each visitor a ``visit(observation, **kwargs)`` callable).
"""
