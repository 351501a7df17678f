"""Fixture-table catalog helpers.

The test corpus is the driver's TPC-H-ish star schema plus ``events``
(stream-shaped), ``documents`` (text corpus) and ``embeddings`` (vector
corpus) — one parquet file per table under a scale-factor directory.

``load`` returns a DataFrame for one table; ``register_views`` registers
every table as a temp view so SQL-path queries (``spark.sql``) see the same
names the DuckDB oracle uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one fixture table. Parquet scan → columnar, pushdown-friendly.

    ``events.ts`` has shipped in two physical encodings across fixture
    generations, so the loader type-guards on the dtype Spark actually
    read rather than assuming either one:

    - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it by
      default; with ``spark.sql.legacy.parquet.nanosAsLong`` (runtime
      conf, safe on any session) it arrives as a raw nanos LongType and
      we rebuild a microsecond TimestampType instant with integer
      arithmetic (``ts DIV 1000`` — exact; double division would lose
      precision above 2^53 ns). Matches DuckDB's ns→us truncation.
    - parquet timestamp[us] (isAdjustedToUTC=false): arrives as
      TIMESTAMP_NTZ; converted to a TimestampType *instant* by pure
      NTZ wall-clock arithmetic (``timestampdiff`` from the NTZ epoch),
      which pins the naive wall clock to UTC under ANY session timezone.
      A plain ``cast("timestamp")`` would re-interpret the wall clock in
      the session timezone — correct only under pinned UTC, and the
      driver's own session need not pin it (measured: epoch outputs
      shifted −5 h under America/New_York). DuckDB reads the same bytes
      as naive TIMESTAMP and ``epoch_us`` treats them as UTC, so this is
      the encoding both engines agree on.
    """
    if table not in TABLES:
        raise ValueError(f"unknown table {table!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{table}.parquet")
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        if isinstance(ts_type, T.TimestampNTZType):
            return df.withColumn(
                "ts",
                F.expr(
                    "timestamp_micros(timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ'1970-01-01 00:00:00', ts))"
                ),
            )
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view named after itself."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
