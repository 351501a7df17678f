"""LIVE Structured Streaming queries in the correctness corpus.

Unlike the batch twins in ``events_queries``, these actually run a
``readStream`` → watermark → stateful-operator → memory-sink pipeline and
return the sink's contents. Determinism argument: the fixture is staged as
ONE file → ONE micro-batch, and in update mode every window/session/key
state created in that batch is emitted exactly once with its final value —
so the result equals the batch aggregation and the same DuckDB oracle
applies. (Multi-batch emission timing is exercised separately in
tests/test_streaming.py, where it belongs — it is watermark-dependent and
not oracle-expressible.)
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import dec
from airflow_postgres_csv_spark.streaming import windows as SW


# staged source dirs awaiting cleanup; drained by _run after q.stop()
_STAGED_DIRS: list[str] = []

# last completed stream's final StreamingQueryProgress (plan-pin tests read
# the stateful operator's state-store partition count from here)
_LAST_PROGRESS: list = [None]


def _staged_stream(
    spark: SparkSession, sf_dir: str, sentinels: bool = False
) -> DataFrame:
    """Stage the events fixture into a temp dir (file-source streams need a
    directory) and open it as a stream.

    ``sentinels=True`` appends two far-future single-event files (fresh
    negative user ids) as separate micro-batches. This is the heartbeat
    pattern for append-mode finalization: sentinel 1 advances the
    watermark past every real session at the end of batch 2, sentinel 2
    triggers batch 3 which evicts-and-emits them all. The sentinel
    sessions themselves never finalize, so they are absent from output.

    Every staged dir is recorded in ``_STAGED_DIRS`` and deleted by the
    next ``_run`` once its stream has stopped (the memory sink owns the
    results by then) — without this, each bench/verify invocation leaked
    a full copy of events.parquet per streaming query run.
    """
    tmp = tempfile.mkdtemp(prefix="spark_graft_stream_")
    _STAGED_DIRS.append(tmp)
    dst = os.path.join(tmp, "000.parquet")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), dst)
    os.utime(dst, (1_000_000, 1_000_000))
    if sentinels:
        import pyarrow as pa
        import pyarrow.parquet as pq

        # match the fixture's physical ts encoding (int64-nanos vs
        # timestamp[us]) so the stream's single explicit schema reads
        # fixture and sentinel files alike — same dtype-guard contract
        # as catalog.load / stream_events
        ts_arrow = pq.read_schema(dst).field("ts").type
        far_ns = 4_000_000_000 * 1_000_000_000  # year 2096, past any fixture ts
        for i, (uid, off) in enumerate([(-1, 0), (-2, 3_600 * 10**9)], start=1):
            # single-row control records — written driver-side with pyarrow
            # (a Spark write job here cost ~5 s each in staging)
            ts_ns = far_ns + off
            if pa.types.is_timestamp(ts_arrow):
                ts_arr = pa.array([ts_ns // 1000], pa.timestamp("us")).cast(ts_arrow)
            else:
                ts_arr = pa.array([ts_ns], pa.int64())
            table = pa.table(
                {
                    "event_id": pa.array([-i], pa.int64()),
                    "ts": ts_arr,
                    "user_id": pa.array([uid], pa.int64()),
                    "event_type": pa.array(["_sentinel"], pa.string()),
                    "value": pa.array([0.0], pa.float64()),
                    "props": pa.array(["{}"], pa.string()),
                }
            )
            dst_i = os.path.join(tmp, f"{i:03d}.parquet")
            pq.write_table(table, dst_i)
            os.utime(dst_i, (1_000_000 + i, 1_000_000 + i))
    return SW.stream_events(spark, tmp)


def _run(
    stream_df: DataFrame, output_mode: str, state_partitions: int = 8
) -> DataFrame:
    """Drive the stream to a memory sink with a scoped state-partition count.

    ``spark.sql.shuffle.partitions`` at query start fixes the stateful
    operator's state-store partition count for the checkpoint's lifetime.
    On a cluster you size it to keyspace/load; for these single-fixture
    micro-batches the per-partition state-store open/commit fixed cost
    dominates (measured: 32 partitions 22s, 8 partitions 15s for the
    session query at sf0.1), so the runner scopes it down and restores the
    session default afterwards.
    """
    name = f"live_{uuid.uuid4().hex[:12]}"
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = SW.run_to_memory_sink(stream_df, name, output_mode=output_mode)
        q.stop()
        _LAST_PROGRESS[0] = q.lastProgress
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        while _STAGED_DIRS:
            shutil.rmtree(_STAGED_DIRS.pop(), ignore_errors=True)
    return spark.table(name)


register(
    "streaming_tumbling_live",
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
    lambda spark, sf_dir: _run(
        _staged_stream(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
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
        ),
        output_mode="update",
    ).orderBy("window_start_s", "event_type")
)


# Sliding windows live: every event contributes to two overlapping
# 10-minute/5-minute-slide windows; update mode on a single micro-batch
# emits each window's final count once, so the batch-twin oracle
# (events_sliding_window) applies verbatim.
register(
    "streaming_sliding_live",
    """
    SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes', ts)) - o.off AS BIGINT) AS window_start_s,
           COUNT(*) AS n
    FROM events, (VALUES (0), (300)) o(off)
    GROUP BY 1
    ORDER BY 1
    """,
)(
    lambda spark, sf_dir: _run(
        _staged_stream(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("window_start_s"), "n"),
        output_mode="update",
    ).orderBy("window_start_s")
)


register(
    "streaming_session_live",
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
      -- same (ts, event_id) total order as the LAG window: with duplicate
      -- (user_id, ts) rows an ORDER BY ts alone could assign a row to the
      -- neighboring session nondeterministically (ADVICE r4 class)
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
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
    lambda spark, sf_dir: _run(
        SW.session_counts(
            _staged_stream(spark, sf_dir, sentinels=True),
            gap="30 minutes",
            watermark="30 minutes",
        ),
        output_mode="append",
    )
    # a trailing no-data batch may finalize sentinel 1's own session once
    # sentinel 2 advances the watermark far enough — strip sentinel users
    .filter(F.col("user_id") >= 0)
    .orderBy("user_id", "session_start_us")
)


register(
    "streaming_dedup_live",
    # append-mode dedup emits each (user_id, event_type)'s first arrival;
    # WHICH event arrives first is partition-order-dependent, so only the
    # key set is deterministic — and that equals DISTINCT.
    "SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type",
)(
    lambda spark, sf_dir: _run(
        _staged_stream(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"]),
        output_mode="append",
    )
    .select("user_id", "event_type")
    .orderBy("user_id", "event_type")
)


register(
    "streaming_join_live",
    # Stream-stream inner interval join: all matches inside one micro-batch
    # are emitted in that batch, so the single-file staging makes the live
    # result equal the batch join the oracle runs.
    """
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_us,
           epoch_us(c.ts) AS click_us,
           p.value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL '10 minutes'
    ORDER BY purchase_id, click_id
    """,
)(
    lambda spark, sf_dir: _run(
        SW.stream_stream_attribution(
            _staged_stream(spark, sf_dir), window_minutes=10
        ),
        output_mode="append",
    ).orderBy("purchase_id", "click_id")
)


register(
    "streaming_enrich_live",
    # Stream-static enrichment join: each micro-batch joins against the
    # static dimension (broadcast — it never shuffles the stream), then a
    # windowed aggregation keyed by the enriched attribute. The canonical
    # "decorate events with dims, then aggregate" streaming pipeline.
    """
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', e.ts)) AS BIGINT) AS window_start_s,
           c.c_mktsegment AS mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)(
    lambda spark, sf_dir: _run(
        _staged_stream(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
        .join(
            F.broadcast(
                __import__(
                    "airflow_postgres_csv_spark.catalog", fromlist=["load"]
                ).load(spark, sf_dir, "customer")
            ),
            F.col("user_id") == F.col("c_custkey"),
            "inner",
        )
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            F.col("c_mktsegment").alias("mktsegment"),
            "n",
            "total_value",
        ),
        output_mode="update",
    ).orderBy("window_start_s", "mktsegment")
)


register(
    "streaming_stateful_profiles_live",
    # Custom stateful operator (applyInPandasWithState) with a FULL oracle:
    # the fixture stages as ONE micro-batch, so update mode emits each
    # user's final profile exactly once, and that equals the batch
    # aggregate. total_value is rounded to 2 decimals on both sides: the
    # exact sum of 2-decimal inputs is itself a 2-decimal value, and the
    # float summation error (~1e-10 at this row count) can never move a
    # 2-decimal value across a 2-decimal rounding boundary — so the round
    # is order-insensitive and engine-stable.
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value,
           epoch_us(MAX(ts)) AS last_ts_us
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)(
    lambda spark, sf_dir: _run(
        __import__(
            "airflow_postgres_csv_spark.streaming.stateful", fromlist=["user_profiles"]
        ).user_profiles(_staged_stream(spark, sf_dir)),
        output_mode="update",
    )
    .select(
        "user_id",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
        "last_ts_us",
    )
    .orderBy("user_id")
)


register(
    "streaming_join_outer_live",
    # Stream-stream LEFT OUTER interval join. Matches emit as they form;
    # NULL-padded unmatched purchases emit only when the click watermark
    # passes their timestamp, so the run uses the sentinel staging: two
    # far-future control batches advance the watermark past every real
    # purchase, forcing all outer-state evictions. Sentinels pass through
    # the watermark nodes but are filtered from both join branches
    # (streaming/windows.py:stream_stream_attribution_outer), so the live
    # result equals the batch LEFT JOIN the oracle runs.
    """
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_us,
           epoch_us(c.ts) AS click_us,
           p.value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL '10 minutes'
    ORDER BY purchase_id, click_id
    """,
)(
    lambda spark, sf_dir: _run(
        SW.stream_stream_attribution_outer(
            _staged_stream(spark, sf_dir, sentinels=True), window_minutes=10
        ),
        output_mode="append",
    ).orderBy("purchase_id", "click_id")
)


# OHLC candles live: the same min_by/max_by candle aggregation as
# rollup_ohlc_hourly, but as a streaming window aggregate (arg-min/max
# merge as partial aggregates in the state store like any other
# declarative agg). Update mode + single micro-batch => final candles,
# so the batch oracle applies verbatim.
register(
    "streaming_ohlc_live",
    """
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
           COUNT(*) AS n_trades
    FROM p
    GROUP BY bucket_s
    ORDER BY bucket_s
    """,
)(
    lambda spark, sf_dir: _run(
        _staged_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withColumn(
            "_k",
            F.concat(
                F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
                F.lpad(F.col("event_id").cast("string"), 12, "0"),
            ),
        )
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.min_by(dec("value"), F.col("_k")).cast("double").alias("open"),
            F.max(dec("value")).cast("double").alias("high"),
            F.min(dec("value")).cast("double").alias("low"),
            F.max_by(dec("value"), F.col("_k")).cast("double").alias("close"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .select(
            F.unix_timestamp("w.start").alias("bucket_s"),
            "open",
            "high",
            "low",
            "close",
            "n_trades",
        ),
        output_mode="update",
    ).orderBy("bucket_s")
)
