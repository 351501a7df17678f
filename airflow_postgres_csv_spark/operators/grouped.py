"""Grouped-map (``applyInPandas``) batch operators.

The grouped-map UDF is the per-group escape hatch: each group arrives as
one pandas DataFrame (Arrow-transferred), the function returns any shape
back. Use it when the per-group logic genuinely doesn't decompose into
window/agg expressions — here, a feature-normalization pass of the kind a
training-data pipeline runs per entity.

100 TB note: one shuffle on the group key, then embarrassingly parallel;
the constraint is that a single group must fit in one task's memory —
guard against giant groups with salting (plans/skew.py) or pre-splitting
when keys are power-law.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["rank_normalize"]

RANKED_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("value_pct", T.DoubleType()),
    ]
)


def rank_normalize(events: DataFrame) -> DataFrame:
    """Per-user percent-rank of event values in [0, 1].

    Rank arithmetic is integer → exact doubles, so the operator is
    bit-replayable by any engine (unlike float z-scores, whose summation
    order differs across engines). Ties broken by event_id.
    """

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["value", "event_id"]).reset_index(drop=True)
        n = len(pdf)
        pdf["value_pct"] = (
            [i / (n - 1) for i in range(n)] if n > 1 else [0.0] * n
        )
        return pdf[["user_id", "event_id", "value", "value_pct"]]

    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(_norm, RANKED_SCHEMA)
    )
