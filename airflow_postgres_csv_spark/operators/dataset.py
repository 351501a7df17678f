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


def compact_dataset(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> dict:
    """Rewrite a parquet dataset's small files into ~``target_bytes`` files;
    returns ``{"files_before", "files_after", "bytes", "rows"}``.

    The maintenance pass every long-lived 100 TB dataset needs: streaming
    ingestion and fine-grained partitioning accumulate kilobyte files whose
    per-file open/footer/task overhead eventually dominates scans. The
    rewrite plans ``ceil(total_bytes / target_bytes)`` output files from the
    dataset's CURRENT on-disk size (cheap file-status listing, no data
    scan), reads once, and writes back partition-aware:

    - with ``partition_cols``: ``repartition(n, partition_cols)`` before a
      partitioned overwrite, so each Hive partition's rows are written by
      at most a handful of tasks instead of every task appending a sliver
      to every partition (the small-file generator itself);
    - without: a plain ``repartition(n)`` — parquet's row-group layout
      keeps downstream scans parallel regardless of file count.

    The write lands in a sibling temp directory and is swapped in with two
    renames (same staging discipline as the JDBC atomic load). POSIX cannot
    swap two directories atomically, so there is an unavoidable window
    between the renames where ``path`` does not exist; a concurrent reader
    in that window sees a missing dataset (never a half-compacted one), and
    the swap is crash-safe — on any failure the original directory is
    restored to ``path`` and the compacted copy is deleted before the
    exception propagates, so the only copy of the data is never stranded
    under a temp name. Overhead is one full read + write of the dataset,
    which is why real systems schedule it off-peak; the op itself is a
    single Spark job with no shuffle beyond the repartition.
    """
    import math
    import os
    import shutil
    import uuid

    files = []
    for root, _dirs, names in os.walk(path):
        files.extend(
            os.path.join(root, n)
            for n in names
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        )
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total_bytes / target_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__compact-{uuid.uuid4().hex[:8]}"
    if partition_cols:
        (
            df.repartition(n_out, *partition_cols)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(tmp)
        )
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    try:
        rows = spark.read.parquet(tmp).count()
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    old = f"{path.rstrip('/')}__old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except Exception:
        # restore the original so `path` never stays missing; the compacted
        # copy is discarded (it was never observed).
        os.rename(old, path)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(old)
    after = sum(
        1
        for root, _dirs, names in os.walk(path)
        for n in names
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    )
    return {
        "files_before": len(files),
        "files_after": after,
        "bytes": total_bytes,
        "rows": rows,
    }
