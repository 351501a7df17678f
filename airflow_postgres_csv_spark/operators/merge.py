"""Merge / upsert: key-matched replace-or-insert over DataFrames.

The reference's only load semantics are append and truncate-load
(reference operators.py:116, 175-177); a corpus that is continuously
re-crawled needs the third: upsert by key. Parquet is immutable, so the
operator produces the merged dataset (caller rewrites the partition or
table — pair with ``operators/dataset.py`` partitioned writes so only
affected partitions rewrite).

Scale: one shuffle each side on the merge key (the anti-join), identical
to what a MERGE INTO does in Delta/Iceberg minus the transaction log.
Broadcast the source side automatically when it is small (the common
incremental-batch case) by leaving it under the session's
autoBroadcastJoinThreshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["merge_upsert"]


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Rows from ``source`` win on key collision; unmatched target rows kept.

    Both inputs must share a schema (enforced by ``unionByName``). The
    result has no duplicate keys iff the inputs individually have none.
    """
    survivors = target.join(source.select(*keys), on=keys, how="left_anti")
    return source.unionByName(survivors)
