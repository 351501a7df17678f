"""Hypertable-style time-series rollup: time_bucket, gap-fill, LOCF,
linear interpolation.

The reference delegates time-series SQL to Postgres (reference
operators.py:80), where the Timescale idiom is ``time_bucket`` +
``time_bucket_gapfill`` + ``locf``/``interpolate``. Spark has ``window``
for streaming but no gap-filling; these compose it from built-ins:

- ``time_bucket`` — epoch-floor to a bucket width; a pure projection, no
  shuffle, stays inside whole-stage codegen.
- ``rollup_timeseries`` — groupBy(bucket, keys): one shuffle, partial
  aggregation map-side. This is the continuous-aggregate shape: at 100 TB
  you materialize it once per ingest batch and query the rollup, not the
  raw hypertable.
- ``gapfill`` — dense bucket spine per key via ``sequence``+``explode``
  cross-joined from each key's own [min, max] bucket range, left-joined
  to the rollup. The spine is generated distributed (one row per key →
  explode on executors), never driver-side. Spine size = keys x buckets;
  at fine granularities prefer per-key ranges (the default) over a global
  range so sparse keys don't inflate it.
- fill strategies: ``zero``/``null`` (constant), ``locf`` (last
  observation carried forward = running ``last(ignorenulls)`` window),
  ``linear`` (interpolate between the bracketing observations with two
  mirrored windows).

The LOCF/linear windows sort each key group once; Catalyst reuses the
gapfill join's hash partitioning on the key, so the whole
rollup→gapfill→fill pipeline is two shuffles total (agg + join/window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["time_bucket", "rollup_timeseries", "gapfill"]


def time_bucket(ts: str | Column, width_seconds: int) -> Column:
    """Floor a timestamp to a ``width_seconds`` bucket (epoch-aligned)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    w = F.lit(int(width_seconds))
    return F.timestamp_seconds(F.floor(F.unix_timestamp(c) / w) * w)


def rollup_timeseries(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    keys: list[str],
    aggs: list[Column],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Continuous-aggregate shape: bucket the time column, group, aggregate."""
    bucketed = df.withColumn(bucket_col, time_bucket(ts_col, width_seconds))
    return bucketed.groupBy(bucket_col, *keys).agg(*aggs)


def _spine(rolled: DataFrame, bucket_col: str, width_seconds: int, keys: list[str]):
    w = F.lit(int(width_seconds))
    per_key = rolled.groupBy(*keys).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    return per_key.select(
        *keys,
        F.explode(
            F.sequence(
                F.unix_timestamp("__lo").cast("long"),
                F.unix_timestamp("__hi").cast("long"),
                w.cast("long"),
            )
        ).alias("__sec"),
    ).select(*keys, F.timestamp_seconds(F.col("__sec")).alias(bucket_col))


def gapfill(
    rolled: DataFrame,
    bucket_col: str,
    width_seconds: int,
    keys: list[str],
    fill: dict[str, str | tuple[str, float]],
) -> DataFrame:
    """Densify a rolled-up series: one row per key per bucket in the key's
    observed [min, max] range, missing buckets filled per ``fill``.

    ``fill`` maps value-column → strategy: ``"null"``, ``"locf"``,
    ``"linear"``, or ``("const", v)``. Non-filled columns pass through
    (null on generated rows).
    """
    spine = _spine(rolled, bucket_col, width_seconds, keys)
    dense = spine.join(rolled, on=[*keys, bucket_col], how="left")

    order = Window.partitionBy(*keys).orderBy(bucket_col)
    past = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    future = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    sec = F.unix_timestamp(F.col(bucket_col)).cast("double")

    out = dense
    for col, how in fill.items():
        c = F.col(col)
        if how == "null":
            continue
        if isinstance(how, tuple):
            out = out.withColumn(col, F.coalesce(c, F.lit(how[1])))
        elif how == "locf":
            out = out.withColumn(col, F.last(c, ignorenulls=True).over(past))
        elif how == "linear":
            prev_v = F.last(c, ignorenulls=True).over(past)
            next_v = F.first(c, ignorenulls=True).over(future)
            prev_t = F.last(F.when(c.isNotNull(), sec), ignorenulls=True).over(past)
            next_t = F.first(F.when(c.isNotNull(), sec), ignorenulls=True).over(future)
            frac = (sec - prev_t) / (next_t - prev_t)
            interp = prev_v + (next_v - prev_v) * frac
            filled = (
                F.when(c.isNotNull(), c)
                .when(prev_v.isNull(), next_v)
                .when(next_v.isNull(), prev_v)
                .otherwise(interp)
            )
            out = out.withColumn(col, filled)
        else:
            raise ValueError(f"unknown fill strategy for {col!r}: {how!r}")
    return out
