"""Event-stream operators in batch mode, oracle-checked (SURVEY.md §2.3).

These are the *semantic* definitions of the streaming operators: the same
tumbling/sliding/session windows run as Structured Streaming queries in
``airflow_postgres_csv_spark.streaming`` (driven in tests/test_streaming.py);
batch mode lets DuckDB replay them for the correctness gate.

Window starts are emitted as epoch seconds/micros (BIGINT): Spark's window
alignment is instant-based, so epoch outputs are identical under any driver
session timezone (verified under UTC and Asia/Kathmandu +05:45).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.global_order import with_global_order_stats
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import dec, t, utc_date, utc_ntz

# ---------------------------------------------------------------------------
# Tumbling window: 10-minute buckets × event_type.
# ---------------------------------------------------------------------------

register(
    "events_tumbling_window",
    """
    SELECT CAST(epoch(time_bucket(INTERVAL '10 minutes', ts)) AS BIGINT) AS window_start_s,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start_s", "event_type")
    )
)


# ---------------------------------------------------------------------------
# Sliding window: 10-minute width, 5-minute slide (each event in exactly 2
# windows). Oracle replays the expansion with a 2-row offset cross join.
# ---------------------------------------------------------------------------

register(
    "events_sliding_window",
    """
    SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes', ts)) - o.off AS BIGINT) AS window_start_s,
           COUNT(*) AS n
    FROM events, (VALUES (0), (300)) o(off)
    GROUP BY 1
    ORDER BY 1
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("window_start_s"), "n")
        .orderBy("window_start_s")
    )
)


# ---------------------------------------------------------------------------
# Session windows: per-user sessions with a 30-minute inactivity gap.
# Spark: native session_window. Oracle: gaps-and-islands (lag + running
# flag sum). session_end in Spark is last_event + gap — replayed likewise.
# ---------------------------------------------------------------------------

register(
    "events_sessionization",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes' OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts) + INTERVAL '30 minutes') AS session_end_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start_us
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
        .orderBy("user_id", "session_start_us")
    )
)


# ---------------------------------------------------------------------------
# Stream dedup (batch semantics): first event per (user_id, event_type) in
# event-time order — what dropDuplicatesWithinWatermark converges to when
# every duplicate arrives within the watermark.
# ---------------------------------------------------------------------------

register(
    "events_dedup_first",
    """
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "events")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us"))
        .orderBy("user_id", "event_type")
    )
)


# ---------------------------------------------------------------------------
# Per-user event-rate statistics — the "user profile" aggregation shape.
# ---------------------------------------------------------------------------

register(
    "events_user_stats",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           epoch_us(MIN(ts)) AS first_us,
           epoch_us(MAX(ts)) AS last_us
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.sum(dec("value")).cast("double").alias("total_value"),
            F.unix_micros(F.min("ts")).alias("first_us"),
            F.unix_micros(F.max("ts")).alias("last_us"),
        )
        .orderBy("user_id")
    )
)


# ---------------------------------------------------------------------------
# Funnel analysis: view → click → purchase, each stage strictly after the
# user's previous-stage first event. Three filtered aggregations chained by
# user_id equi-joins — every stage input shrinks (stage-k users ⊆ stage-k-1
# users), so at scale each join is smaller than the last; no window over
# the full event stream, no per-user event sorting.
# ---------------------------------------------------------------------------


def events_funnel(spark, sf_dir):
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view_users"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_users")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_users")))
        .select(
            "n_view_users",
            "n_click_users",
            "n_purchase_users",
            F.round(
                F.col("n_click_users").cast("double") / F.col("n_view_users"), 6
            ).alias("view_to_click"),
            F.round(
                F.col("n_purchase_users").cast("double") / F.col("n_click_users"), 6
            ).alias("click_to_purchase"),
        )
    )


register(
    "events_funnel",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
           (SELECT COUNT(*) FROM c) AS n_click_users,
           (SELECT COUNT(*) FROM p) AS n_purchase_users,
           ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                 / (SELECT COUNT(*) FROM v), 6) AS view_to_click,
           ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / (SELECT COUNT(*) FROM c), 6) AS click_to_purchase
    """,
)(events_funnel)


# ---------------------------------------------------------------------------
# Cohort retention: users bucketed by first-activity week, activity counted
# per (cohort, week-offset). Week indices are pure integer arithmetic on
# epoch seconds (engine-neutral — no date_trunc week-start conventions).
# Two shuffles: first-event agg + the cohort-cell agg.
# ---------------------------------------------------------------------------

_EPOCH_2024 = 1704067200  # 2024-01-01 00:00:00 UTC
_WEEK_S = 7 * 86400


def events_cohort_retention(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("s")
    )
    first = e.groupBy("user_id").agg(F.min("s").alias("first_s"))
    wk = lambda col: F.floor((F.col(col) - F.lit(_EPOCH_2024)) / F.lit(_WEEK_S))
    return (
        e.join(first, "user_id")
        .select(
            "user_id",
            wk("first_s").alias("cohort_week"),
            (wk("s") - wk("first_s")).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


register(
    "events_cohort_retention",
    f"""
    WITH e AS (
      SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS s FROM events
    ),
    first AS (SELECT user_id, MIN(s) AS first_s FROM e GROUP BY user_id)
    SELECT CAST(FLOOR((first_s - {_EPOCH_2024}) / {_WEEK_S}.0) AS BIGINT)
             AS cohort_week,
           CAST(FLOOR((s - {_EPOCH_2024}) / {_WEEK_S}.0) AS BIGINT)
             - CAST(FLOOR((first_s - {_EPOCH_2024}) / {_WEEK_S}.0) AS BIGINT)
             AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM e JOIN first ON e.user_id = first.user_id
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
)(events_cohort_retention)


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences: count and
# probability of each (prev_state -> state) transition. One window pass
# (lag over user_id) + one hash agg on a tiny key space (|types|^2) + a
# per-source share window over that tiny aggregate — the expensive shuffle
# is keyed by user_id, the rest is constant-size. Sequence-mining staple
# (clickstream modeling, next-event prediction).
# ---------------------------------------------------------------------------


def events_transition_matrix(spark, sf_dir):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    prev = F.lag("event_type").over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pairs = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", prev)
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(W.partitionBy("prev_type"))
    return (
        pairs.select(
            "prev_type",
            "event_type",
            "n",
            # exact: integer-ratio via DECIMAL division, surfaced as double
            (F.col("n").cast("decimal(18,0)") / total.cast("decimal(18,0)"))
            .cast("decimal(18,9)")
            .cast("double")
            .alias("p"),
        )
        .orderBy("prev_type", "event_type")
    )


register(
    "events_transition_matrix",
    """
    WITH pairs AS (
      SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
             event_type
      FROM events
    ),
    agg AS (
      SELECT prev_type, event_type, COUNT(*) AS n
      FROM pairs WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, event_type, n,
           CAST(CAST(CAST(n AS DECIMAL(18,0))
                     / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DECIMAL(18,0))
                AS DECIMAL(18,9)) AS DOUBLE) AS p
    FROM agg
    ORDER BY prev_type, event_type
    """,
)(events_transition_matrix)


# ---------------------------------------------------------------------------
# SCD2-style state history: collapse each user's consecutive identical
# event_type runs into validity intervals (gaps-and-islands), with
# valid_from/valid_to and a version counter. The warehouse pattern for
# building slowly-changing-dimension type-2 tables from change streams.
# Two window passes over the same (user_id, ts, event_id) sort order —
# Catalyst reuses one sort/exchange for both.
# ---------------------------------------------------------------------------


def events_scd2_intervals(spark, sf_dir):
    from pyspark.sql import Window as W

    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(order))
        .withColumn(
            "is_change",
            (F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))).cast(
                "int"
            ),
        )
        .withColumn(
            "version",
            F.sum("is_change").over(
                order.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
    )
    runs = e.groupBy("user_id", "version").agg(
        F.first("event_type").alias("state"),
        F.min("ts").alias("from_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
    nxt = W.partitionBy("user_id").orderBy("version")
    return runs.select(
        "user_id",
        "version",
        "state",
        F.unix_micros("from_ts").alias("valid_from_us"),
        F.unix_micros(F.lead("from_ts").over(nxt)).alias("valid_to_us"),
        "n_events",
    ).orderBy("user_id", "version")


register(
    "events_scd2_intervals",
    """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_type IS NULL OR prev_type <> event_type
                     THEN 1 ELSE 0 END AS is_change
      FROM e
    ),
    versioned AS (
      SELECT *, CAST(SUM(is_change) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
      FROM flagged
    ),
    runs AS (
      SELECT user_id, version,
             MIN(event_type) AS state,
             MIN(ts) AS from_ts,
             COUNT(*) AS n_events
      FROM versioned
      GROUP BY user_id, version
    )
    SELECT user_id, version, state,
           epoch_us(from_ts) AS valid_from_us,
           epoch_us(LEAD(from_ts) OVER (PARTITION BY user_id ORDER BY version))
             AS valid_to_us,
           n_events
    FROM runs
    ORDER BY user_id, version
    """,
)(events_scd2_intervals)


# ---------------------------------------------------------------------------
# Hourly volume anomaly scoring: z-score of each (event_type, hour) count
# against that type's hourly history. No stddev_samp/STDDEV builtins —
# Spark (Welford) and DuckDB disagree in the last float ulps — instead the
# variance is spelled out from exact BIGINT sums with the SAME expression
# tree on both engines, so every double op is bit-identical IEEE.
# ---------------------------------------------------------------------------


def events_anomaly_zscore(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type",
            (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 3600).alias(
                "bucket_s"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("event_type")
    cnt = F.count(F.lit(1)).over(w).cast("double")
    s = F.sum("n").over(w).cast("double")
    sq = F.sum(F.col("n") * F.col("n")).over(w).cast("double")
    mean = s / cnt
    var = (sq - s * s / cnt) / (cnt - F.lit(1.0))
    return (
        hourly.withColumn("z", (F.col("n") - mean) / F.sqrt(var))
        .select("event_type", "bucket_s", "n", "z")
        .orderBy("event_type", "bucket_s")
    )


register(
    "events_anomaly_zscore",
    """
    WITH hourly AS (
      SELECT event_type,
             CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS bucket_s,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    st AS (
      SELECT event_type, bucket_s, n,
             CAST(COUNT(*) OVER w AS DOUBLE) AS cnt,
             CAST(SUM(n) OVER w AS DOUBLE) AS s,
             CAST(SUM(n * n) OVER w AS DOUBLE) AS sq
      FROM hourly
      WINDOW w AS (PARTITION BY event_type)
    )
    SELECT event_type, bucket_s, n,
           (n - s / cnt) / sqrt((sq - s * s / cnt) / (cnt - 1.0)) AS z
    FROM st
    ORDER BY event_type, bucket_s
    """,
)(events_anomaly_zscore)


# ---------------------------------------------------------------------------
# RFM (recency / frequency / monetary) user segmentation — the standard
# marketing-analytics rollup. Quintile assignment via ntile over a fully
# deterministic order (metric, then user_id) so both engines tie-break
# identically; monetary goes through the exact decimal view.
# Scale note: each quintile is a distributed bucket-offset ntile over the
# PER-USER rollup (cardinality = users) — partition-parallel at any user
# count; the rollup itself is checkpointed once so the three orderings
# (and their min/max scalar passes) don't re-aggregate the events scan.
# ---------------------------------------------------------------------------


def events_rfm_segments(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    per_user = e.groupBy("user_id").agg(
        F.unix_micros(F.max("ts")).alias("last_us"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(dec("value")).cast("double").alias("monetary"),
    ).localCheckpoint(eager=False)
    # Three global quintiles over user-cardinality aggregates: each uses the
    # distributed bucket-offset ntile (operators/global_order.py), never an
    # unpartitioned window — users scale with the corpus.
    for col, out in (
        ("last_us", "r_quintile"),
        ("frequency", "f_quintile"),
        ("monetary", "m_quintile"),
    ):
        per_user = with_global_order_stats(
            per_user, col, descending=True, tiebreak="user_id", ntile=5, ntile_col=out
        )
    return (
        per_user.select(
            "user_id", "last_us", "frequency", "monetary",
            "r_quintile", "f_quintile", "m_quintile",
        )
        .orderBy("user_id")
    )


register(
    "events_rfm_segments",
    """
    WITH per_user AS (
      SELECT user_id,
             epoch_us(MAX(ts)) AS last_us,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT user_id, last_us, frequency, monetary,
           ntile(5) OVER (ORDER BY last_us DESC, user_id) AS r_quintile,
           ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_quintile,
           ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_quintile
    FROM per_user
    ORDER BY user_id
    """,
)(events_rfm_segments)


# ---------------------------------------------------------------------------
# Inter-arrival (dwell-time) statistics per user ordered by event time —
# the session-behavior signal feeding bot detection and engagement scores.
# Gaps are integer microseconds (lag diffs); mean is exact-int-sum /
# count and the median interpolates BIGINTs (at worst .5 — exact), so
# every output is engine-stable.
# ---------------------------------------------------------------------------


def events_interarrival_stats(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select(
            "user_id",
            "event_type",
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(w))
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            (F.sum("gap_us").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "mean_gap_us"
            ),
            F.median("gap_us").cast("double").alias("median_gap_us"),
        )
        .orderBy("event_type")
    )


register(
    "events_interarrival_stats",
    """
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_gaps,
           MIN(gap_us) AS min_gap_us,
           MAX(gap_us) AS max_gap_us,
           CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_gap_us,
           CAST(median(gap_us) AS DOUBLE) AS median_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)(events_interarrival_stats)


# ---------------------------------------------------------------------------
# Ordered 3-step path analysis: each user's first three events (by time,
# event_id tie-break) as a path string, counted across users — the
# top-paths view of funnel analytics. Ordered string_agg on both engines.
# ---------------------------------------------------------------------------


def events_top_paths(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    first3 = (
        e.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )
    paths = first3.groupBy("user_id").agg(
        F.array_join(
            # collect in rn order: sort (rn, event_type) structs then strip
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s.getField("event_type"),
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
    )


register(
    "events_top_paths",
    """
    WITH ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path
    """,
)(events_top_paths)


# ---------------------------------------------------------------------------
# User-growth curve: new users per day (by first-seen day) and the
# cumulative distinct-user count — computed as first-day dedup + windowed
# cumulative sum of integers, never a windowed COUNT(DISTINCT) (which
# would hold per-window user sets in state at scale).
# ---------------------------------------------------------------------------


def events_user_growth(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    first_day = (
        # utc_date: a bare cast(ts as date) buckets in the SESSION zone
        # and shifts day boundaries under a non-UTC driver session
        e.groupBy("user_id")
        .agg(F.min(utc_date("ts")).alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        first_day.withColumn("cum_users", F.sum("new_users").over(w))
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "new_users", "cum_users")
        .orderBy("day")
    )


register(
    "events_user_growth",
    """
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
    ),
    per_day AS (
      SELECT d, COUNT(*) AS new_users FROM first_day GROUP BY d
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY d
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_users
    FROM per_day
    ORDER BY day
    """,
)(events_user_growth)


# ---------------------------------------------------------------------------
# Linear multi-touch attribution: each purchase's value is split equally
# across the user's clicks in the preceding 7 days (the classic
# marketing-attribution primitive; first/last-touch are the as-of joins
# in temporal_queries). Granularity is one row per purchase — the credit
# division is a SINGLE IEEE division from exact inputs, so no double
# summation exists anywhere and the result is engine-identical.
#
# 100 TB shape: equi-join on user_id with the window predicate as a
# post-join filter — per-user event counts bound the fan-out; the count
# is a hash agg keyed by purchase.
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000


def _events_attribution_linear(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
        "value",
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    # LEFT join WITHOUT a window filter + conditional count: filtering the
    # joined rows would drop purchases whose clicks are all out-of-window
    # instead of reporting them with n_touches = 0.
    gap = F.unix_micros("pts") - F.unix_micros("cts")
    in_window = (gap > 0) & (gap <= _ATTR_WINDOW_US)
    joined = purchases.join(clicks, "user_id", "left")
    counted = joined.groupBy("purchase_id", "user_id", "pts", "value").agg(
        F.sum(
            F.when(F.col("cts").isNotNull() & in_window, 1).otherwise(0)
        ).alias("n_touches")
    )
    return counted.select(
        "purchase_id",
        "user_id",
        dec("value").cast("double").alias("value"),
        "n_touches",
        F.when(
            F.col("n_touches") > 0,
            dec("value").cast("double") / F.col("n_touches"),
        ).alias("credit_per_click"),
    ).orderBy("purchase_id")


register(
    "events_attribution_linear",
    f"""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS pts, value
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'
    ),
    g AS (
      SELECT p.purchase_id, p.user_id, p.pts, p.value,
             CAST(SUM(CASE WHEN c.cts IS NOT NULL
                       AND epoch_us(p.pts) - epoch_us(c.cts) > 0
                       AND epoch_us(p.pts) - epoch_us(c.cts) <= {_ATTR_WINDOW_US}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_touches
      FROM p LEFT JOIN c ON c.user_id = p.user_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT purchase_id, user_id,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value,
           n_touches,
           CASE WHEN n_touches > 0
                THEN CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) / n_touches
           END AS credit_per_click
    FROM g ORDER BY purchase_id
    """,
)(_events_attribution_linear)


# ---------------------------------------------------------------------------
# Burstiness (Fano factor) of hourly event volume per type: variance-to-
# mean ratio of per-hour counts — ~1 for Poisson-like traffic, >1 bursty.
# Two-level aggregation (hourly integer counts → exact integer moments);
# variance and Fano come from ONE fixed IEEE expression over exact
# integers, so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------


def _events_burstiness(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("hour_idx"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        F.max("c").alias("peak"),
    )
    mean = F.col("total").cast("double") / F.col("n_hours")
    var = F.col("sum_c2").cast("double") / F.col("n_hours") - mean * mean
    return agg.select(
        "event_type",
        "n_hours",
        "total",
        "peak",
        F.round(mean, 9).alias("mean_per_hour"),
        F.round(var / mean, 9).alias("fano"),
    ).orderBy("event_type")


register(
    "events_burstiness",
    """
    WITH hourly AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hour_idx,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type, COUNT(*) AS n_hours, CAST(SUM(c) AS BIGINT) AS total,
             SUM(c * c) AS sum_c2, MAX(c) AS peak
      FROM hourly GROUP BY event_type
    )
    SELECT event_type, n_hours, total, peak,
           ROUND(CAST(total AS DOUBLE) / n_hours, 9) AS mean_per_hour,
           ROUND((CAST(sum_c2 AS DOUBLE) / n_hours
                  - (CAST(total AS DOUBLE) / n_hours)
                    * (CAST(total AS DOUBLE) / n_hours))
                 / (CAST(total AS DOUBLE) / n_hours), 9) AS fano
    FROM agg ORDER BY event_type
    """,
)(_events_burstiness)


# ---------------------------------------------------------------------------
# Session-length histogram + bounce rate: sessions from the same
# 30-minute-gap sessionization, bucketed by event count (1 = bounce,
# 2-4, 5-9, 10+). Bounce rate is ONE IEEE division of exact counts.
# ---------------------------------------------------------------------------


def _events_session_bounce(spark, sf_dir):
    sess = (
        t(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    band = (
        F.when(F.col("n_events") == 1, F.lit("1"))
        .when(F.col("n_events") <= 4, F.lit("2-4"))
        .when(F.col("n_events") <= 9, F.lit("5-9"))
        .otherwise(F.lit("10+"))
    )
    hist = sess.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    totals = sess.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias("bounces"),
    )
    return (
        hist.crossJoin(F.broadcast(totals))
        .select(
            "band",
            "n_sessions",
            "total",
            (F.col("bounces").cast("double") / F.col("total")).alias(
                "bounce_rate"
            ),
        )
        .orderBy("band")
    )


register(
    "events_session_bounce",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes' OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      -- same (ts, event_id) total order as the LAG window above: with
      -- duplicate (user_id, ts) rows an ORDER BY ts alone could assign a
      -- row to the neighboring session nondeterministically (ADVICE r4)
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events
      FROM sessions GROUP BY 1, 2
    ),
    totals AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS bounces
      FROM per_session
    )
    SELECT CASE WHEN n_events = 1 THEN '1'
                WHEN n_events <= 4 THEN '2-4'
                WHEN n_events <= 9 THEN '5-9'
                ELSE '10+' END AS band,
           COUNT(*) AS n_sessions,
           t.total,
           CAST(t.bounces AS DOUBLE) / t.total AS bounce_rate
    FROM per_session, totals t
    GROUP BY 1, t.total, t.bounces
    ORDER BY 1
    """,
)(_events_session_bounce)


# ---------------------------------------------------------------------------
# CUSUM change-point — where did each event type's hourly volume shift?
# S_h = Σ_{i≤h}(c_i − mean) peaks at the regime change (Page 1954); the
# batch twin of a drift monitor. Exactness: the cumulative term is an
# integer running sum and mean = total/H enters once per row as
# (rank·total)/H — cum − rank·total/H is ONE float expression over exact
# int64 operands, so no float accumulation exists to diverge between
# engines. argmax by |S| with an hour tie-break via max_by on a packed
# ordering value; one window over (type, hour) counts — O(hours) state,
# never O(events).
# ---------------------------------------------------------------------------

def _events_cusum_changepoint(spark, sf_dir):
    hourly = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 3600).alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = W.partitionBy("event_type").orderBy("h")
    stats = hourly.select(
        "event_type",
        "h",
        "c",
        F.sum("c").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("cum"),
        F.row_number().over(w).cast("long").alias("rnk"),
        F.sum("c").over(W.partitionBy("event_type")).alias("total"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("nh"),
    )
    cusum = stats.select(
        "event_type",
        "h",
        (
            F.col("cum").cast("double")
            - (F.col("rnk") * F.col("total")).cast("double") / F.col("nh")
        ).alias("s"),
    )
    return (
        cusum.groupBy("event_type")
        .agg(
            F.max_by(
                "h",
                F.abs(F.col("s")) * F.lit(4294967296.0)
                - (F.col("h") % 4294967296).cast("double"),
            ).alias("change_hour"),
            F.max(F.abs(F.col("s"))).alias("peak_cusum"),
        )
        .orderBy("event_type")
    )


register(
    "events_cusum_changepoint",
    """
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT event_type, h, c,
               CAST(SUM(c) OVER w AS BIGINT) AS cum,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk,
               CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS total,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nh
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), cusum AS (
        SELECT event_type, h,
               CAST(cum AS DOUBLE) - CAST(rnk * total AS DOUBLE) / nh AS s
        FROM stats
    )
    SELECT event_type,
           CAST(arg_max(h, ABS(s) * 4294967296 - (h % 4294967296)) AS BIGINT)
               AS change_hour,
           MAX(ABS(s)) AS peak_cusum
    FROM cusum
    GROUP BY event_type
    ORDER BY event_type
    """,
)(_events_cusum_changepoint)


# Hourly-volume autocorrelation (ACF at lags 1-3) per event type — the
# periodicity/trend diagnostic next to events_burstiness (Fano) and
# events_cusum_changepoint (level shifts). Pearson r over (c_h, c_{h+k})
# pairs from exact int64 moments (n, Σx, Σy, Σxy, Σx², Σy²) — counts are
# integers, so every aggregation is exact; the only floats are one
# fixed-shape num/(√d1·√d2) per output row. One window pass produces all
# three leads; no self-join, O(hours) state.
# ---------------------------------------------------------------------------

def _events_autocorrelation(spark, sf_dir):
    led = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 3600).alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "event_type",
            "c",
            *[
                F.lead("c", k)
                .over(W.partitionBy("event_type").orderBy("h"))
                .alias(f"c{k}")
                for k in (1, 2, 3)
            ],
        )
    )
    pairs = led.selectExpr(
        "event_type", "stack(3, 1, c, c1, 2, c, c2, 3, c, c3) AS (lag, x, y)"
    ).where(F.col("y").isNotNull())
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    d1 = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    d2 = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return (
        pairs.groupBy("event_type", "lag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
        .select(
            "event_type",
            F.col("lag").cast("long").alias("lag"),
            "n",
            (num / (F.sqrt(d1) * F.sqrt(d2))).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


register(
    "events_autocorrelation",
    """
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), led AS (
        SELECT event_type, c,
               lead(c, 1) OVER w AS c1,
               lead(c, 2) OVER w AS c2,
               lead(c, 3) OVER w AS c3
        FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY h)
    ), pairs AS (
        SELECT event_type, 1 AS lag, c AS x, c1 AS y FROM led WHERE c1 IS NOT NULL
        UNION ALL
        SELECT event_type, 2, c, c2 FROM led WHERE c2 IS NOT NULL
        UNION ALL
        SELECT event_type, 3, c, c3 FROM led WHERE c3 IS NOT NULL
    ), moments AS (
        SELECT event_type, lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x*y) AS BIGINT) AS sxy,
               CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy
        FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag, n,
           CAST(n*sxy - sx*sy AS DOUBLE)
             / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS acf
    FROM moments
    ORDER BY event_type, lag
    """,
)(_events_autocorrelation)


# ---------------------------------------------------------------------------
# A/B experiment readout: deterministic hash assignment of every user into
# control (arm 0) / treatment (arm 1), per-user purchase-count metric, and
# the Welch two-sample t statistic on the arm means — the full "did the
# experiment move the metric" scorecard in ONE aggregation pass. Scale
# shape: one groupBy(user_id) (per-user metric) + one 1-row conditional
# agg; the hash assignment is a pure projection (no salt table, no join),
# which is exactly how real experiment platforms bucket at any scale.
# Determinism: assignments are md5-derived, per-user counts are integers,
# and every double (means, variances, t) is derived from exact BIGINT sums
# with the identical expression tree in both engines.
# ---------------------------------------------------------------------------


def _events_ab_ttest(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("conv")
    ).select(arm.alias("arm"), "conv")

    def _arm(x, col):
        return F.sum(F.when(F.col("arm") == x, col).otherwise(F.lit(0)))

    agg = per_user.agg(
        _arm(0, F.lit(1)).cast("long").alias("n_c"),
        _arm(1, F.lit(1)).cast("long").alias("n_t"),
        _arm(0, F.col("conv")).cast("long").alias("s_c"),
        _arm(1, F.col("conv")).cast("long").alias("s_t"),
        _arm(0, F.col("conv") * F.col("conv")).cast("long").alias("ss_c"),
        _arm(1, F.col("conv") * F.col("conv")).cast("long").alias("ss_t"),
    )
    n_c, n_t = F.col("n_c").cast("double"), F.col("n_t").cast("double")
    s_c, s_t = F.col("s_c").cast("double"), F.col("s_t").cast("double")
    ss_c, ss_t = F.col("ss_c").cast("double"), F.col("ss_t").cast("double")
    mean_c, mean_t = s_c / n_c, s_t / n_t
    var_c = (ss_c - s_c * s_c / n_c) / (n_c - F.lit(1.0))
    var_t = (ss_t - s_t * s_t / n_t) / (n_t - F.lit(1.0))
    return agg.select(
        "n_c",
        "n_t",
        "s_c",
        "s_t",
        mean_c.alias("mean_conv_c"),
        mean_t.alias("mean_conv_t"),
        var_c.alias("var_conv_c"),
        var_t.alias("var_conv_t"),
        (
            (mean_t - mean_c) / F.sqrt(var_t / n_t + var_c / n_c)
        ).alias("t_welch"),
    )


register(
    "events_ab_ttest",
    """
    WITH per_user AS (
      SELECT ('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conv
      FROM events GROUP BY user_id
    ),
    agg AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS s_c,
        CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS s_t,
        CAST(SUM(CASE WHEN arm = 0 THEN conv * conv ELSE 0 END) AS BIGINT) AS ss_c,
        CAST(SUM(CASE WHEN arm = 1 THEN conv * conv ELSE 0 END) AS BIGINT) AS ss_t
      FROM per_user
    )
    SELECT n_c, n_t, s_c, s_t,
           CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS mean_conv_c,
           CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS mean_conv_t,
           (CAST(ss_c AS DOUBLE) - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))
             / (CAST(n_c AS DOUBLE) - 1.0) AS var_conv_c,
           (CAST(ss_t AS DOUBLE) - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE))
             / (CAST(n_t AS DOUBLE) - 1.0) AS var_conv_t,
           (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE) - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))
             / sqrt(
                 ((CAST(ss_t AS DOUBLE) - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE))
                    / (CAST(n_t AS DOUBLE) - 1.0)) / CAST(n_t AS DOUBLE)
                 + ((CAST(ss_c AS DOUBLE) - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                    / (CAST(n_c AS DOUBLE) - 1.0)) / CAST(n_c AS DOUBLE)
               ) AS t_welch
    FROM agg
    """,
)(_events_ab_ttest)
