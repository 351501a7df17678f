"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

A join between two tables bucketed on the join key with the same bucket
count needs **no shuffle at query time** — each task zips bucket i with
bucket i. At 100 TB the write-once shuffle this replaces is the single
biggest cost in any repeatedly-joined fact/fact pipeline (e.g. lineitem ⋈
orders every run), so bucket the storage once and amortize it forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_pair"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally lets sort-merge join skip its
    per-task sort (and makes min/max file skipping effective).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_pair(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_table: str,
    right_table: str,
    n_buckets: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """Bucket both sides of a to-be-repeated equi-join on its key and
    return the bucketed scans (join them shuffle-free)."""
    write_bucketed(left, left_table, [key], n_buckets, sort_cols=[key])
    write_bucketed(right, right_table, [key], n_buckets, sort_cols=[key])
    return spark.table(left_table), spark.table(right_table)
