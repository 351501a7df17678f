"""Shared helpers for the query corpus.

The determinism strategy (exact-decimal aggregation, string-formatted
timestamps) lives here so every query module uses the same idioms and the
Spark side stays bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.catalog import load


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load(spark, sf_dir, name)


def dec(col: str | Column, scale: int = 2) -> Column:
    """Exact decimal view of a 2-decimal double column.

    Fixture doubles carry exactly 2 decimals (verified in FIXTURES), so this
    cast is lossless and makes downstream +,*,SUM exact (deterministic
    regardless of partitioning / summation order).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: str | Column, alias: str) -> Column:
    """SUM over the exact-decimal view, surfaced as double."""
    return F.sum(dec(col)).cast("double").alias(alias)


def ts_str(col: str | Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Engine-neutral timestamp rendering (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)


# DuckDB-side equivalents (string snippets for oracle SQL)
SQL_DEC = "CAST({col} AS DECIMAL(18,{scale}))"


def sql_dsum(col: str, alias: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


SQL_TS = "strftime({col}, '%Y-%m-%d %H:%M:%S')"
