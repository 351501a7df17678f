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


# ---------------------------------------------------------------------------
# Time-weighted average (TimescaleDB `time_weight('LOCF', ...)` shape):
# each observation holds its value until the next one, so the average
# weights each value by its holding duration. One lead() window pass per
# user + one agg — all numerator/denominator arithmetic stays in exact
# integers/decimals (micros × 2-decimal value), and the final single
# division is the same IEEE double op in both engines.
# ---------------------------------------------------------------------------


def rollup_time_weighted_avg(spark, sf_dir):
    from pyspark.sql import Window as W

    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("us", F.unix_micros("ts"))
        .withColumn("next_us", F.lead("us").over(order))
        .filter(F.col("next_us").isNotNull())
        .withColumn("dt_us", F.col("next_us") - F.col("us"))
    )
    num = F.sum(dec("value") * F.col("dt_us").cast("decimal(20,0)"))
    den = F.sum(F.col("dt_us").cast("decimal(20,0)"))
    return (
        e.groupBy("user_id")
        .agg(
            # quotient surfaced at a fixed 9-decimal scale: the numerator's
            # unscaled value can exceed 2^53, where DuckDB's decimal→double
            # conversion is not correctly rounded — rounding the quotient
            # (~11 sig digits, double ulp ~7e-15) absorbs that last-ulp gap.
            # Operands are first cast down (still lossless: num < 1e23,
            # den < 1e16) so Spark's decimal-division scale rule keeps 15
            # fractional digits instead of clamping to 6.
            (num.cast("decimal(25,2)") / den.cast("decimal(16,0)"))
            .cast("decimal(18,9)")
            .cast("double")
            .alias("twa_value"),
            den.cast("long").alias("span_us"),
            F.count(F.lit(1)).alias("n_holds"),
        )
        .orderBy("user_id")
    )


register(
    "rollup_time_weighted_avg",
    """
    WITH held AS (
      SELECT user_id,
             epoch_us(ts) AS us,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_us,
             value
      FROM events
    ),
    spans AS (
      SELECT user_id, value, next_us - us AS dt_us
      FROM held WHERE next_us IS NOT NULL
    )
    SELECT user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(dt_us AS DECIMAL(20,0)))
                     / SUM(CAST(dt_us AS DECIMAL(20,0))) AS DECIMAL(18,9)) AS DOUBLE)
             AS twa_value,
           CAST(SUM(CAST(dt_us AS DECIMAL(20,0))) AS BIGINT) AS span_us,
           COUNT(*) AS n_holds
    FROM spans
    GROUP BY user_id
    ORDER BY user_id
    """,
)(rollup_time_weighted_avg)


# ---------------------------------------------------------------------------
# Hourly OHLC (open/high/low/close) — the canonical financial/telemetry
# candle rollup. Open/close are value-at-min/max event time; ties on ts
# break by event_id so both engines pick the same row (min/max over a
# (ts, event_id, value) struct — pure built-in aggregates, one shuffle).
# Values go through the exact DECIMAL(18,2) view so candles hash-match.
# ---------------------------------------------------------------------------


def rollup_ohlc_hourly(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    bucket = (F.unix_timestamp("ts") - F.unix_timestamp("ts") % _HOUR).alias(
        "bucket_s"
    )
    # lexicographic (ts, event_id) composite as a zero-padded string — a
    # total order both engines agree on (DuckDB arg_min/max take VARCHAR
    # keys; struct keys do not bind there)
    ordkey = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        e.select(bucket, F.col("value"), ordkey.alias("_k"))
        .groupBy("bucket_s")
        .agg(
            F.min_by(dec("value"), F.col("_k")).cast("double").alias("open"),
            F.max(dec("value")).cast("double").alias("high"),
            F.min(dec("value")).cast("double").alias("low"),
            F.max_by(dec("value"), F.col("_k")).cast("double").alias("close"),
            F.count(F.lit(1)).alias("n_trades"),
            dsum("value", "volume"),
        )
        .orderBy("bucket_s")
    )


register(
    "rollup_ohlc_hourly",
    f"""
    WITH p AS (
      SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS bucket_s,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 12, '0') AS k,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events WHERE event_type = 'purchase'
    )
    SELECT bucket_s,
           CAST(arg_min(v, k) AS DOUBLE) AS open,
           CAST(MAX(v) AS DOUBLE) AS high,
           CAST(MIN(v) AS DOUBLE) AS low,
           CAST(arg_max(v, k) AS DOUBLE) AS close,
           COUNT(*) AS n_trades,
           CAST(SUM(v) AS DOUBLE) AS volume
    FROM p
    GROUP BY bucket_s
    ORDER BY bucket_s
    """,
)(rollup_ohlc_hourly)


# ---------------------------------------------------------------------------
# EWMA smoothing of hourly revenue per event_type — the monitoring/
# forecasting staple. Determinism strategy: the half-life is dyadic
# (alpha = 1/2 per hour), so over the trailing 16-hour frame the weights
# are exact powers of two and the weighted numerator is EXACT integer
# arithmetic (hourly cent-sums × 2^i summed left-to-right inside one
# array aggregate); the only float op is the final single IEEE division
# num/den, bit-identical in both engines. Plan: one hash-agg to hours
# (map-side partial), one partitioned window per event_type carrying a
# 16-element array — no global sort, no driver state.
# ---------------------------------------------------------------------------


def _rollup_ewma_dyadic(spark, sf_dir):
    from pyspark.sql import Window as W

    hourly = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            # epoch-aligned floor (same as operators/rollup.py:time_bucket):
            # session-timezone-independent, unlike date_trunc('hour')
            (F.floor(F.unix_timestamp("ts") / _HOUR) * _HOUR).alias("bucket_s"),
        )
        .agg((F.sum(dec("value")) * 100).cast("long").alias("v100"))
    )
    frame = (
        W.partitionBy("event_type")
        .orderBy("bucket_s")
        .rowsBetween(-15, W.currentRow)
    )
    arr = F.collect_list("v100").over(frame)
    # Horner fold, newest-first: weight of element i (0 = oldest) is 2^i —
    # exact long arithmetic, no float until the final division.
    num = F.aggregate(
        F.reverse(arr),
        F.lit(0).cast("long"),
        lambda acc, x: acc * 2 + x,
    )
    den = (F.pow(F.lit(2.0), F.size(arr)).cast("long") - 1) * 100
    return (
        hourly.select(
            "event_type",
            "bucket_s",
            (F.col("v100").cast("double") / 100).alias("hourly_rev"),
            (num.cast("double") / den.cast("double")).alias("ewma_rev"),
        )
        .orderBy("event_type", "bucket_s")
    )


register(
    "rollup_ewma_dyadic",
    """
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_s,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS v100
      FROM events GROUP BY 1, 2
    ),
    framed AS (
      SELECT event_type, bucket_s, v100,
             list(v100) OVER (PARTITION BY event_type ORDER BY bucket_s
                              ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS arr
      FROM hourly
    )
    SELECT event_type, bucket_s,
           CAST(v100 AS DOUBLE) / 100 AS hourly_rev,
           CAST(list_sum(list_transform(arr, (x, i) -> x * (CAST(1 AS BIGINT) << (i - 1)))) AS DOUBLE)
             / CAST(((CAST(1 AS BIGINT) << len(arr)) - 1) * 100 AS DOUBLE) AS ewma_rev
    FROM framed
    ORDER BY event_type, bucket_s
    """,
)(_rollup_ewma_dyadic)


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest: predict each hour's event count with
# the count from the same hour one day earlier (the period-24 naive
# baseline every forecasting system is benchmarked against), scored over
# every hour where both actual and forecast exist. One groupBy builds the
# hourly series; the forecast "model" is a self equi-join on the shifted
# hour key (reusing the (event_type, h) partitioning — no second scan of
# the fact table); MAE / bias come from exact integer error sums with one
# final division. Hour ids are pure epoch arithmetic (tz-independent).
# ---------------------------------------------------------------------------

_SN_ANCHOR = 1704067200  # 2024-01-01T00:00:00Z
_SN_PERIOD = 24


def _rollup_seasonal_naive(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cnt = (
        ev.select(
            "event_type",
            F.floor((F.unix_timestamp("ts") - F.lit(_SN_ANCHOR)) / 3600)
            .cast("long")
            .alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # actual + shifted-forecast branches
    )
    fc = cnt.select(
        "event_type",
        (F.col("h") + F.lit(_SN_PERIOD)).alias("h"),
        F.col("c").alias("f"),
    )
    scored = cnt.join(fc, ["event_type", "h"])
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.abs(F.col("c") - F.col("f"))).cast("long").alias("abs_err"),
            F.sum(F.col("c") - F.col("f")).cast("long").alias("bias"),
            F.sum("c").cast("long").alias("actual_total"),
        )
        .select(
            "event_type",
            "n_hours",
            "abs_err",
            "bias",
            "actual_total",
            (F.col("abs_err").cast("double") / F.col("n_hours").cast("double")).alias(
                "mae"
            ),
        )
        .orderBy("event_type")
    )


register(
    "rollup_seasonal_naive",
    f"""
    WITH cnt AS (
      SELECT event_type,
             CAST(FLOOR((epoch(ts) - {_SN_ANCHOR}) / 3600) AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT a.event_type, a.c, f.c AS f
      FROM cnt a JOIN cnt f
        ON f.event_type = a.event_type AND f.h = a.h - {_SN_PERIOD}
    )
    SELECT event_type,
           COUNT(*) AS n_hours,
           CAST(SUM(ABS(c - f)) AS BIGINT) AS abs_err,
           CAST(SUM(c - f) AS BIGINT) AS bias,
           CAST(SUM(c) AS BIGINT) AS actual_total,
           CAST(SUM(ABS(c - f)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mae
    FROM scored GROUP BY event_type ORDER BY event_type
    """,
)(_rollup_seasonal_naive)
