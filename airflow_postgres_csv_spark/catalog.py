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

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects by default. We read it as a raw nanos long
    (``spark.sql.legacy.parquet.nanosAsLong`` — a runtime conf, safe to set
    on any session including the driver's) and rebuild a microsecond
    TimestampType instant with integer arithmetic (``ts DIV 1000`` — exact;
    a double division would lose precision above 2^53 ns). This matches
    DuckDB's own nanos→micros truncation, so oracle comparisons line up.
    """
    if table not in TABLES:
        raise ValueError(f"unknown table {table!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{table}.parquet")
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return spark.read.parquet(path).withColumn(
            "ts", F.expr("timestamp_micros(ts DIV 1000)")
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view named after itself."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
