"""Custom stateful streaming operators via ``applyInPandasWithState``.

This is the escape hatch for operators Spark's built-in streaming cannot
express: arbitrary per-key state machines. The example operator maintained
here — a per-user running profile (event count, value total, last-seen
timestamp) emitted on every update — is the canonical "feature store
update" shape of an LLM-data pipeline.

State is Arrow-batched per key group; the state store scales with the
number of distinct keys (users), not stream length.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PROFILE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

PROFILE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts_us": [last_us],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Per-user running profile, one updated row per user per micro-batch.

    ``events`` must carry ``user_id``, ``value`` and a ``ts`` timestamp;
    the operator keys state by user and emits the cumulative profile on
    every batch that touches the user.
    """
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        stateStructType=PROFILE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
