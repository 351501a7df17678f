"""Structured Streaming operators over the events stream.

The batch queries in ``queries/events_queries.py`` define the semantics
(and are oracle-checked); this module runs the same logical operators as
real streaming queries: ``readStream`` source → event-time watermark →
windowed aggregation / dedup → sink.

Scale notes:
- Watermarks bound state: a windowed agg keeps only windows newer than
  (max event time - watermark); dropDuplicatesWithinWatermark keeps only
  keys within the horizon. State store size is O(active windows/keys),
  not O(stream length) — the property that lets these run forever.
- File-source streams here (parquet dirs) stand in for Kafka; swapping
  ``format("parquet")`` for ``format("kafka")`` changes no operator code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# Legacy fixture generation: ts = parquet TIMESTAMP(NANOS) read as raw longs
EVENTS_RAW_SCHEMA = _events_schema(T.LongType())


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """Open the events directory as a file-source stream.

    File-source streams need an explicit schema, and ``events.ts`` has
    shipped as both TIMESTAMP(NANOS) (read as raw nanos longs) and
    timestamp[us] (read as TIMESTAMP_NTZ) across fixture generations —
    so probe the dtype with a one-off batch read of the same directory
    (footer-only, no data scan) and declare the matching stream schema.
    Same dtype-guard contract as ``catalog.load``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_type = spark.read.parquet(events_dir).schema["ts"].dataType
    raw = (
        spark.readStream.format("parquet")
        .schema(_events_schema(ts_type))
        .option("maxFilesPerTrigger", 1)
        .load(events_dir)
    )
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    if isinstance(ts_type, T.TimestampNTZType):
        # NTZ wall clock pinned to UTC via pure NTZ arithmetic — a plain
        # cast would shift the instant under a non-UTC session timezone
        # (see catalog.load for the measured failure).
        return raw.withColumn(
            "ts",
            F.expr(
                "timestamp_micros(timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ'1970-01-01 00:00:00', ts))"
            ),
        )
    return raw


def tumbling_counts(
    events: DataFrame, width: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window count/sum per event_type with a late-data watermark.

    Streaming twin of the oracle-checked ``events_tumbling_window``.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window counts (streaming twin of ``events_sliding_window``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("window_start_s"), "n")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Session windows per user (streaming twin of ``events_sessionization``).

    Session state merges adjacent windows as events arrive; the watermark
    finalizes (and emits) a session once no event can extend it.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Drop duplicate events, keeping state only inside the watermark
    horizon (streaming twin of ``events_dedup_first``'s convergence)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["user_id", "event_type"]
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, output_mode: str = "append"
):
    """Drive a streaming DataFrame to a memory sink synchronously.

    Starts the query, processes everything currently available, and
    returns the StreamingQuery (caller stops it). The test harness for
    every operator above.
    """
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def stream_stream_attribution(
    events: DataFrame,
    window_minutes: int = 10,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: each purchase paired with every click by
    the same user in the preceding ``window_minutes``.

    The canonical two-stream interval join (Spark Structured Streaming's
    flagship stateful op beyond aggregation). Both sides carry a
    watermark; the time-range predicate bounds the join state — click
    state is dropped once the purchase-side watermark passes
    click.ts + window, so state size is O(rate x window), not O(stream).
    Output is append-mode safe (inner joins emit matches as they form).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value"),
        )
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES"))
    )
    return purchases.join(clicks, cond, "inner").select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.unix_micros("p_ts").alias("purchase_us"),
        F.unix_micros("c_ts").alias("click_us"),
        "value",
    )


def stream_stream_attribution_outer(
    events: DataFrame,
    window_minutes: int = 10,
    watermark: str = "30 minutes",
    control_type: str = "_sentinel",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every purchase paired with
    its preceding clicks, or emitted once NULL-padded if none arrive.

    The outer side is the stateful part Spark only finalizes on watermark
    progress: an unmatched purchase sits in the join state until the
    watermark passes ``p_ts`` (no earlier click can still arrive), then
    emits exactly once with NULL click columns.

    **Control-row contract.** A watermark only advances on rows that
    reach its operator, and Catalyst pushes deterministic filters BELOW
    ``withWatermark`` — so a control/heartbeat row that the branch filter
    drops never advances anything (measured: the watermark froze and 7
    join-state rows were never evicted). Control rows therefore ride
    *through* both branch filters (``event_type IN (branch, control)``)
    and are removed ABOVE the join, where filters cannot be pushed into
    the stateful operator. Control rows must use reserved user ids that
    never occur in real traffic: an in-band control click sharing a real
    user id could win the match that suppresses that purchase's
    NULL-padded row.

    State bound is the same as the inner variant — O(rate × (window +
    watermark delay)) per side, not O(stream) — append-mode only, as
    Spark requires for outer stream-stream joins.
    """
    marked = events.withWatermark("ts", watermark)
    clicks = marked.filter(
        F.col("event_type").isin("click", control_type)
    ).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
        F.col("event_type").alias("c_type"),
    )
    purchases = marked.filter(
        F.col("event_type").isin("purchase", control_type)
    ).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value"),
        F.col("event_type").alias("p_type"),
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES"))
    )
    return (
        purchases.join(clicks, cond, "left_outer")
        .where(
            (F.col("p_type") != control_type)
            & (F.col("c_type").isNull() | (F.col("c_type") != control_type))
        )
        .select(
            "purchase_id",
            "click_id",
            F.col("p_user").alias("user_id"),
            F.unix_micros("p_ts").alias("purchase_us"),
            F.unix_micros("c_ts").alias("click_us"),
            "value",
        )
    )
