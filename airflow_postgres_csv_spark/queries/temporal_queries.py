"""Temporal-join and merge queries, oracle-checked.

The as-of oracle uses DuckDB's native ``ASOF JOIN`` — an independent
implementation of the same semantics — so the union+window formulation
in ``operators/temporal.py`` is differentially tested against a second
engine's purpose-built operator, not against itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.merge import merge_upsert
from airflow_postgres_csv_spark.operators.temporal import asof_join, bucketed_range_join
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import dsum, t

# ---------------------------------------------------------------------------
# As-of join: attribute every event to the user's last *strictly earlier*
# click. Classic attribution shape; (user_id, ts) is unique in the fixture
# so the match is deterministic.
# ---------------------------------------------------------------------------


def join_asof_last_click(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts", "event_type"),
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
        strict=True,
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("asof_event_id").alias("last_click_id"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"),
    ).orderBy("event_id")


register(
    "join_asof_last_click",
    """
    SELECT e.event_id, e.user_id, e.event_type,
           c.event_id AS last_click_id,
           epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
    FROM events e
    ASOF LEFT JOIN (
        SELECT user_id AS cu, ts, event_id
        FROM events WHERE event_type = 'click'
    ) c ON e.user_id = c.cu AND e.ts > c.ts
    ORDER BY e.event_id
    """,
)(join_asof_last_click)


# ---------------------------------------------------------------------------
# As-of with tolerance: purchases attributed to the last click within 30
# minutes, else unattributed. Tolerance nulls the match (pandas
# merge_asof(tolerance=...) semantics) — it does NOT fall back to an older
# click, and the oracle must reproduce exactly that.
# ---------------------------------------------------------------------------

_TOL_US = 30 * 60 * 1_000_000


def join_asof_tolerance(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
        strict=True,
        tolerance_us=_TOL_US,
    )
    return out.select(
        "event_id",
        "user_id",
        "value",
        F.col("asof_event_id").alias("attributed_click_id"),
    ).orderBy("event_id")


register(
    "join_asof_tolerance",
    f"""
    SELECT p.event_id, p.user_id, p.value,
           CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= {_TOL_US}
                THEN c.event_id END AS attributed_click_id
    FROM (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
        SELECT user_id AS cu, ts, event_id
        FROM events WHERE event_type = 'click'
    ) c ON p.user_id = c.cu AND p.ts > c.ts
    ORDER BY p.event_id
    """,
)(join_asof_tolerance)


# ---------------------------------------------------------------------------
# Range join: events vs OVERLAPPING 7-day windows sliding by 2 days (each
# event lands in up to 4 windows). The bucketed rewrite turns the
# inequality join Catalyst would BNL into an equi-shuffle join; the oracle
# runs the plain inequality join in DuckDB (IEJoin) — two different
# physical strategies, same relation.
# ---------------------------------------------------------------------------


def join_range_interval_overlap(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("event_id", "ts", "value")
    # window instants built by epoch arithmetic: a timestamp'...' literal
    # parses in the SESSION timezone and would shift every window under a
    # non-UTC driver session (2024-01-01T00:00Z = 1704067200)
    iv = spark.range(15).select(
        F.col("id").alias("w_id"),
        F.expr(
            "timestamp_micros(1704067200000000 + id * 2 * 86400000000)"
        ).alias("w_start"),
        F.expr(
            "timestamp_micros(1704067200000000 + (id * 2 + 7) * 86400000000)"
        ).alias("w_end"),
    )
    joined = bucketed_range_join(
        ev, iv, left_ts="ts", start_col="w_start", end_col="w_end",
        bucket_seconds=7 * 86400,
    )
    return (
        joined.groupBy("w_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .orderBy("w_id")
    )


register(
    "join_range_interval_overlap",
    """
    WITH iv AS (
        SELECT i AS w_id,
               TIMESTAMP '2024-01-01' + INTERVAL (i*2) DAY AS w_start,
               TIMESTAMP '2024-01-01' + INTERVAL (i*2+7) DAY AS w_end
        FROM generate_series(0, 14) AS t(i)
    )
    SELECT w_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM iv JOIN events e ON e.ts >= iv.w_start AND e.ts < iv.w_end
    GROUP BY w_id ORDER BY w_id
    """,
)(join_range_interval_overlap)


# ---------------------------------------------------------------------------
# Merge/upsert: incremental batch replaces matching keys, keeps the rest.
# ---------------------------------------------------------------------------


def merge_upsert_customer(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + F.lit(1000.0)
    )
    return merge_upsert(cust, updates, keys=["c_custkey"]).orderBy("c_custkey")


register(
    "merge_upsert_customer",
    """
    WITH src AS (
        SELECT c_custkey, c_name, c_nationkey,
               c_acctbal + 1000.0 AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM src
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT c_custkey FROM src)
    ORDER BY c_custkey
    """,
)(merge_upsert_customer)


# ---------------------------------------------------------------------------
# Forward as-of join: each click attributed to the user's NEXT purchase
# within 2 hours (click→conversion latency, the mirror of last-click
# attribution). Same single-shuffle union+window plan, carry frame
# flipped to first-over-following. The oracle is the independent
# min-join formulation (earliest qualifying purchase, joined back for
# payload) — (user_id, ts) is unique in the fixture so both are
# deterministic.
# ---------------------------------------------------------------------------

_FWD_TOL_US = 2 * 3600 * 1_000_000


def join_asof_forward(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        direction="forward",
        tolerance_us=_FWD_TOL_US,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id").alias("next_purchase_id"),
        F.col("asof_value").alias("purchase_value"),
        (F.unix_micros("asof_ts") - F.unix_micros("ts")).alias("gap_us"),
    ).orderBy("event_id")


register(
    "join_asof_forward",
    f"""
    WITH c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT c.event_id, c.user_id, c.ts AS cts, MIN(p.ts) AS nts
      FROM c LEFT JOIN p
        ON p.user_id = c.user_id AND p.ts >= c.ts
       AND epoch_us(p.ts) - epoch_us(c.ts) <= {_FWD_TOL_US}
      GROUP BY 1, 2, 3
    )
    SELECT m.event_id, m.user_id,
           p.event_id AS next_purchase_id,
           p.value AS purchase_value,
           epoch_us(m.nts) - epoch_us(m.cts) AS gap_us
    FROM m LEFT JOIN p ON p.user_id = m.user_id AND p.ts = m.nts
    ORDER BY m.event_id
    """,
)(join_asof_forward)


# --- as-of NEAREST: closest purchase in absolute time (pandas
# merge_asof(direction="nearest") parity; ties toward backward). Tolerance
# composes identically to the directional variants because the
# nearest-candidate-out-of-tolerance case implies the other direction is
# farther and therefore also out.
_NEAR_TOL_US = 2 * 3600 * 1_000_000


def join_asof_nearest(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        direction="nearest",
        tolerance_us=_NEAR_TOL_US,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id").alias("near_purchase_id"),
        F.col("asof_value").alias("purchase_value"),
        (F.unix_micros("asof_ts") - F.unix_micros("ts")).alias("gap_us"),
    ).orderBy("event_id")


register(
    "join_asof_nearest",
    f"""
    WITH c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT c.event_id, c.user_id, c.ts AS cts,
             MAX(CASE WHEN p.ts <= c.ts THEN p.ts END) AS bts,
             MIN(CASE WHEN p.ts >= c.ts THEN p.ts END) AS fts
      FROM c LEFT JOIN p
        ON p.user_id = c.user_id
       AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= {_NEAR_TOL_US}
      GROUP BY 1, 2, 3
    ),
    ch AS (
      SELECT event_id, user_id, cts,
             CASE
               WHEN bts IS NULL THEN fts
               WHEN fts IS NULL THEN bts
               WHEN epoch_us(cts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(cts)
                 THEN bts
               ELSE fts
             END AS nts
      FROM m
    )
    SELECT ch.event_id, ch.user_id,
           p.event_id AS near_purchase_id,
           p.value AS purchase_value,
           epoch_us(ch.nts) - epoch_us(ch.cts) AS gap_us
    FROM ch LEFT JOIN p ON p.user_id = ch.user_id AND p.ts = ch.nts
    ORDER BY ch.event_id
    """,
)(join_asof_nearest)


# --- window-constrained funnel: first view -> first click within 1 hour
# -> first purchase within 24 hours, per user. Composed from TWO forward
# as-of joins (strict, tolerance-bounded) — the sequential-pattern shape
# where each stage must occur within a deadline of the previous one,
# which the plain min-ts funnel (events_funnel) cannot express. Output
# is one row per user with per-stage epoch-micro timestamps (NULL once
# the chain breaks), so the driver hash checks the exact chain.
_WF_CLICK_US = 3600 * 1_000_000
_WF_PURCH_US = 24 * 3600 * 1_000_000


def events_windowed_funnel(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    s2 = asof_join(
        first_view,
        clicks,
        on="user_id",
        left_ts="view_ts",
        right_ts="ts",
        right_cols=[],
        strict=True,
        tolerance_us=_WF_CLICK_US,
        direction="forward",
    ).select("user_id", "view_ts", F.col("asof_ts").alias("click_ts"))
    with_click = s2.filter(F.col("click_ts").isNotNull())
    s3 = asof_join(
        with_click,
        purchases,
        on="user_id",
        left_ts="click_ts",
        right_ts="ts",
        right_cols=[],
        strict=True,
        tolerance_us=_WF_PURCH_US,
        direction="forward",
    ).select(
        "user_id", "view_ts", "click_ts", F.col("asof_ts").alias("purchase_ts")
    )
    no_click = s2.filter(F.col("click_ts").isNull()).withColumn(
        "purchase_ts", F.lit(None).cast("timestamp")
    )
    out = s3.unionByName(no_click)
    return out.select(
        "user_id",
        F.unix_micros("view_ts").alias("view_us"),
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
    ).orderBy("user_id")


register(
    "events_windowed_funnel",
    f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS view_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT v.user_id, v.view_ts, MIN(e.ts) AS click_ts
      FROM v LEFT JOIN events e
        ON e.user_id = v.user_id AND e.event_type = 'click'
       AND e.ts > v.view_ts
       AND epoch_us(e.ts) - epoch_us(v.view_ts) <= {_WF_CLICK_US}
      GROUP BY 1, 2
    ),
    p AS (
      SELECT c.user_id, c.view_ts, c.click_ts, MIN(e.ts) AS purchase_ts
      FROM c LEFT JOIN events e
        ON c.click_ts IS NOT NULL
       AND e.user_id = c.user_id AND e.event_type = 'purchase'
       AND e.ts > c.click_ts
       AND epoch_us(e.ts) - epoch_us(c.click_ts) <= {_WF_PURCH_US}
      GROUP BY 1, 2, 3
    )
    SELECT user_id,
           epoch_us(view_ts) AS view_us,
           epoch_us(click_ts) AS click_us,
           epoch_us(purchase_ts) AS purchase_us
    FROM p ORDER BY user_id
    """,
)(events_windowed_funnel)
