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
    """Read one fixture table. Parquet scan → columnar, pushdown-friendly."""
    if table not in TABLES:
        raise ValueError(f"unknown table {table!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view named after itself."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
