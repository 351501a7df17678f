"""Time-series rollup + gap-fill queries, oracle-checked.

Buckets are surfaced as epoch seconds (``bucket_s``) — never rendered
timestamps — so results are independent of the Spark session timezone
(the driver may run non-UTC; see events_queries.py for the same idiom).

The DuckDB oracle rebuilds the spine with ``generate_series`` + window
functions — an independent formulation of gapfill/LOCF/interpolation —
so ``operators/rollup.py`` is differentially tested, not self-checked.
At sf0.01 roughly half the hourly spine rows are generated gaps, so all
fill paths (const, LOCF, both interpolation branches and both edge
branches) execute on real data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.rollup import gapfill, rollup_timeseries
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import dec, dsum, t

_HOUR = 3600


def _purchases(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .withColumn("grp", F.col("user_id") % 4)
    )


# ---------------------------------------------------------------------------
# Hourly continuous aggregate per group, gaps filled: counts to 0, running
# total carried forward (TimescaleDB time_bucket_gapfill + locf shape).
# ---------------------------------------------------------------------------


def rollup_gapfill_locf(spark, sf_dir):
    rolled = rollup_timeseries(
        _purchases(spark, sf_dir),
        ts_col="ts",
        width_seconds=_HOUR,
        keys=["grp"],
        aggs=[F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
    )
    dense = gapfill(
        rolled,
        bucket_col="bucket",
        width_seconds=_HOUR,
        keys=["grp"],
        fill={"n_events": ("const", 0), "sum_value": "locf"},
    )
    return dense.select(
        "grp",
        F.unix_timestamp("bucket").alias("bucket_s"),
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value",
    ).orderBy("grp", "bucket_s")


register(
    "rollup_gapfill_locf",
    f"""
    WITH rolled AS (
        SELECT user_id % 4 AS grp,
               CAST(floor(epoch(ts)/{_HOUR})*{_HOUR} AS BIGINT) AS bucket_s,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ), bounds AS (
        SELECT grp, min(bucket_s) AS lo, max(bucket_s) AS hi FROM rolled GROUP BY 1
    ), spine AS (
        SELECT grp, unnest(generate_series(lo, hi, {_HOUR})) AS bucket_s
        FROM bounds
    )
    SELECT s.grp, s.bucket_s,
           COALESCE(r.n_events, 0) AS n_events,
           LAST_VALUE(r.sum_value IGNORE NULLS) OVER (
               PARTITION BY s.grp ORDER BY s.bucket_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value
    FROM spine s LEFT JOIN rolled r USING (grp, bucket_s)
    ORDER BY grp, bucket_s
    """,
)(rollup_gapfill_locf)


# ---------------------------------------------------------------------------
# Linear interpolation across gaps. Both engines compute the identical
# IEEE-double expression prev + (next - prev) * ((t - t0) / (t1 - t0))
# over identical deterministic inputs, so values match bit-for-bit.
# ---------------------------------------------------------------------------


def rollup_gapfill_linear(spark, sf_dir):
    rolled = rollup_timeseries(
        _purchases(spark, sf_dir).filter(F.col("value") > 90),
        ts_col="ts",
        width_seconds=_HOUR,
        keys=["grp"],
        aggs=[
            (F.sum(dec("value")).cast("double") / F.count(F.lit(1))).alias(
                "avg_value"
            )
        ],
    )
    dense = gapfill(
        rolled,
        bucket_col="bucket",
        width_seconds=_HOUR,
        keys=["grp"],
        fill={"avg_value": "linear"},
    )
    return dense.select(
        "grp",
        F.unix_timestamp("bucket").alias("bucket_s"),
        "avg_value",
    ).orderBy("grp", "bucket_s")


register(
    "rollup_gapfill_linear",
    f"""
    WITH rolled AS (
        SELECT user_id % 4 AS grp,
               CAST(floor(epoch(ts)/{_HOUR})*{_HOUR} AS BIGINT) AS bucket_s,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                 AS avg_value
        FROM events WHERE event_type = 'purchase' AND value > 90
        GROUP BY 1, 2
    ), bounds AS (
        SELECT grp, min(bucket_s) AS lo, max(bucket_s) AS hi FROM rolled GROUP BY 1
    ), spine AS (
        SELECT grp, unnest(generate_series(lo, hi, {_HOUR})) AS bucket_s
        FROM bounds
    ), joined AS (
        SELECT s.grp, s.bucket_s, r.avg_value,
               LAST_VALUE(r.avg_value IGNORE NULLS) OVER w_past AS prev_v,
               FIRST_VALUE(r.avg_value IGNORE NULLS) OVER w_next AS next_v,
               LAST_VALUE(CASE WHEN r.avg_value IS NOT NULL
                               THEN CAST(s.bucket_s AS DOUBLE) END IGNORE NULLS)
                   OVER w_past AS prev_t,
               FIRST_VALUE(CASE WHEN r.avg_value IS NOT NULL
                                THEN CAST(s.bucket_s AS DOUBLE) END IGNORE NULLS)
                   OVER w_next AS next_t
        FROM spine s LEFT JOIN rolled r USING (grp, bucket_s)
        WINDOW w_past AS (PARTITION BY s.grp ORDER BY s.bucket_s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_next AS (PARTITION BY s.grp ORDER BY s.bucket_s
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT grp, bucket_s,
           CASE WHEN avg_value IS NOT NULL THEN avg_value
                WHEN prev_v IS NULL THEN next_v
                WHEN next_v IS NULL THEN prev_v
                ELSE prev_v + (next_v - prev_v)
                     * ((CAST(bucket_s AS DOUBLE) - prev_t) / (next_t - prev_t))
           END AS avg_value
    FROM joined
    ORDER BY grp, bucket_s
    """,
)(rollup_gapfill_linear)
