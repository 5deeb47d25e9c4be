"""Batched language-ID + perplexity stage (iterator pandas UDF).

Reference analog: the string-dispatched blueprint functions
(``bp.set('Observation.proposal.id', 'get_proposal_id()')``,
``wallaby2caom2/main_app.py:126,159-198``) — per-record derived values —
re-expressed as ONE Arrow-batched model stage. The iterator form means the
langid matrix + LM table (functions/langid.py, functions/perplexity.py —
deterministic, rebuilt identically per executor python worker at import, the
no-file-shipping equivalent of broadcasting a fastText .bin via SparkFiles)
are touched once per worker, not once per batch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LANGID_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("lang_conf", T.FloatType()),
        T.StructField("ppl", T.DoubleType()),
    ]
)


@F.pandas_udf(LANGID_SCHEMA)
def langid_ppl_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    # import inside: executed on the executor python worker, once per process
    from ..functions import textscore

    for transcripts in batches:
        texts = [t if isinstance(t, str) else None for t in transcripts.to_numpy()]
        langs, confs, ppls = textscore.score_batch(texts)
        yield pd.DataFrame({"lang": langs, "lang_conf": confs, "ppl": ppls})


def with_langid(df: DataFrame) -> DataFrame:
    return (
        df.withColumn("_lid", langid_ppl_udf(F.col("transcript")))
        .select("*", "_lid.*")
        .drop("_lid")
    )
