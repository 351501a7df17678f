"""Partitioned-dataset sink — how a curated corpus actually lands on
storage at 100 TB.

Hive-style partition directories (``lang=en/…``) give readers free
partition pruning; ``maxRecordsPerFile`` bounds file sizes; the
pre-repartition on the partition key prevents the small-files explosion
(without it, every task writes a sliver into every partition directory:
tasks × partitions files instead of ~1 per partition per shuffle slot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["write_partitioned_dataset"]


def write_partitioned_dataset(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    max_records_per_file: int = 1_000_000,
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
) -> int:
    """Write ``df`` as a Hive-partitioned parquet dataset; returns rowcount.

    ``sort_within`` sorts rows inside each task's output (after the
    partition-key repartition), which tightens parquet min/max column
    stats for post-prune file skipping.

    The returned rowcount is observed on the write pass itself
    (``df.observe``) — the source plan executes exactly once.
    """
    obs = Observation()
    out = df.observe(obs, F.count(F.lit(1)).alias("rows_written")).repartition(
        *partition_by
    )
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )
    return int(obs.get["rows_written"])
