"""Frequent-items (heavy hitters) via per-partition Misra-Gries summaries.

The built-in sketch families (HLL distinct, theta set-algebra, KLL
quantiles) are registered in queries/functions_sql.py on Spark's
DataSketches functions; Spark has no frequent-items sketch, so this
operator supplies the missing member with the classic two-pass shape:

1. **Candidate pass (map-side only, no shuffle):** each partition folds its
   rows through a Misra-Gries summary of capacity ``c = ceil(1/ratio)``.
   MG undercounts any item by at most ``n_p / c`` within a partition, and
   the error is additive across partitions, so every item with global
   frequency > n·ratio survives in at least one partition's summary —
   candidate recall is GUARANTEED, not probabilistic (Misra & Gries 1982;
   mergeability per Agarwal et al., "Mergeable Summaries", PODS'12).
2. **Exact pass:** one filtered hash-agg counts ONLY the candidates
   (semi-join on the collected candidate set — bounded by c · #partitions,
   metadata-sized) and keeps those with exact count > n·ratio.

Output is therefore EXACT heavy hitters with exact counts — which is what
makes the operator differential-testable against a plain GROUP BY/HAVING
oracle — while scan cost stays two passes and the only shuffle is the
final ≤ c·P-row aggregation.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters"]


def _mg_fold(values: Iterator[pd.Series], capacity: int) -> dict:
    """Fold a partition's values through a Misra-Gries summary."""
    counters: dict = {}
    for chunk in values:
        for v in chunk:
            if v in counters:
                counters[v] += 1
            elif len(counters) < capacity:
                counters[v] = 1
            else:
                # decrement-all step; drop zeros
                dead = []
                for k in counters:
                    counters[k] -= 1
                    if counters[k] == 0:
                        dead.append(k)
                for k in dead:
                    del counters[k]
    return counters


def heavy_hitters(df: DataFrame, col: str, min_freq_ratio: float) -> DataFrame:
    """Items of ``col`` with frequency > ``min_freq_ratio`` of the rows,
    with EXACT counts: (``item``, ``freq``).

    ``min_freq_ratio`` bounds summary size: capacity is ceil(1/ratio) per
    partition, so a 0.001 ratio costs 1000 counters per task regardless of
    data volume.
    """
    if not 0.0 < min_freq_ratio < 1.0:
        raise ValueError("min_freq_ratio must be in (0, 1)")
    capacity = math.ceil(1.0 / min_freq_ratio)

    def _partition_summary(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = _mg_fold((b[col] for b in batches), capacity)
        yield pd.DataFrame({col: list(counters.keys())})

    item_type = df.schema[col].dataType.simpleString()
    candidates = (
        df.select(col)
        .mapInPandas(_partition_summary, f"{col} {item_type}")
        .distinct()
    )
    total = df.select(F.count(F.lit(1)).alias("_n"))
    return (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .join(F.broadcast(total))
        .where(F.col("freq") > F.col("_n") * F.lit(min_freq_ratio))
        .select(F.col(col).alias("item"), "freq")
    )
