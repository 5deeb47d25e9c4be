"""Compiled-regex PII/toxicity scrub stage (Arrow-batched pandas UDF).

Reference analog: declarative value repair P15 — ``ValueRepairCache``
(``wallaby2caom2/main_app.py:84-96``, applied at ``:253``): a table of
(pattern → replacement) applied to every record. The table lives in
functions/scrub.py, compiled once per executor python worker at import
(equivalent to broadcasting the compiled list); the stage emits the scrubbed
text plus an edit count that feeds the run metrics (north-rule counter
``scrub_edits``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCRUB_SCHEMA = T.StructType(
    [
        T.StructField("scrubbed_transcript", T.StringType()),
        T.StructField("scrub_edits", T.IntegerType()),
    ]
)


@F.pandas_udf(SCRUB_SCHEMA)
def scrub_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    from ..functions import scrub

    for transcripts in batches:
        texts = [t if isinstance(t, str) else None for t in transcripts.to_numpy()]
        out_t, out_n = scrub.scrub_batch(texts)
        yield pd.DataFrame(
            {
                "scrubbed_transcript": pd.array(out_t, dtype="string"),
                "scrub_edits": pd.array(out_n, dtype="int32"),
            }
        )


def with_scrub(df: DataFrame, keep_col: str = "keep") -> DataFrame:
    """Scrub kept rows; dropped rows carry NULL scrubbed text / 0 edits
    (matching the oracle contract). Spark evaluates the UDF per batch and the
    ``when`` masks dropped rows afterwards — acceptable because ~2/3 of rows
    survive the cascade; a filter→scrub→union split would add a shuffle-free
    but plan-splitting union for little gain."""
    scrubbed = scrub_udf(F.col("transcript"))
    return (
        df.withColumn(
            "_scr",
            F.when(F.col(keep_col), scrubbed).otherwise(
                F.lit(None).cast(SCRUB_SCHEMA)
            ),
        )
        .withColumn("scrubbed_transcript", F.col("_scr.scrubbed_transcript"))
        .withColumn(
            "scrub_edits", F.coalesce(F.col("_scr.scrub_edits"), F.lit(0))
        )
        .drop("_scr")
    )
