"""One-pass column profiling — the data-quality summary every ingest
pipeline computes before accepting a batch: row count, null count,
distinct count, min/max per column, as a long-format relation
``(column, n, n_nulls, n_distinct, min_s, max_s)``.

Shape: ONE aggregate over the input builds every per-column statistic in
the same pass (no per-column scans), then a ``stack`` unpivot emits one
row per column — all JVM-side expressions, fully codegen'd.

100 TB note: ``exact=True`` uses ``COUNT(DISTINCT ...)``; several exact
distinct counts in one aggregate make Catalyst plan an Expand (one data
copy per distinct column) — fine at audit scale, wrong for a full-corpus
profile. ``exact=False`` switches to ``approx_count_distinct`` (one
HyperLogLog per column, no Expand, mergeable map-side), the default choice
for scheduled profiling of petabyte tables. Min/max are emitted as strings
so the relation is column-type-agnostic; profile numeric-only or
string/date columns for engine-portable formatting (float-to-string
formatting is engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(df: DataFrame, cols: list[str], exact: bool = True) -> DataFrame:
    if not cols:
        raise ValueError("profile_columns: need at least one column")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        ndv = F.count_distinct(F.col(c)) if exact else F.approx_count_distinct(c)
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            ndv.alias(f"__ndv_{c}"),
            # min/max on the NATIVE type, cast after — casting first would
            # make integer extremes lexicographic ("10" < "9")
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __ndv_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_s, max_s)"
        ),
        F.col("__n").alias("n"),
    ).select("column", "n", "n_nulls", "n_distinct", "min_s", "max_s")
