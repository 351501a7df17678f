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

__all__ = ["write_partitioned_dataset", "compact_dataset", "recover_compact_swap"]


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
    snapshot: bool = False,
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

    **Preferred mode** — ``snapshot=True``: ``path`` is a versioned
    snapshot root (``operators/snapshots.py``) and the compaction is a
    manifest commit via ``snapshot_compact``: the commit point is one
    atomic manifest link, readers never see a missing or half-compacted
    dataset at ANY instant (including a hard kill at any point), and old
    versions stay time-travelable until ``snapshot_expire``.

    The plain-directory mode swaps the compacted copy in with two renames.
    POSIX cannot swap two directories atomically, so there is an
    unavoidable window between the renames where ``path`` does not exist
    (a concurrent reader sees a missing dataset, never a half-compacted
    one). Crash behavior, exactly: a recovery marker
    (``{path}__swap.json`` naming the old/new staging dirs) is written
    before the first rename and removed after the swap completes; an
    in-process failure restores the original to ``path`` before the
    exception propagates; a HARD KILL between the renames leaves ``path``
    missing but both copies intact under their staging names — run
    :func:`recover_compact_swap` (roll-forward to the verified compacted
    copy, else roll-back) to restore it. Data is never deleted until the
    swap has fully completed, so no crash point strands the only copy.
    Overhead is one full read + write of the dataset, which is why real
    systems schedule it off-peak; the op itself is a single Spark job
    with no shuffle beyond the repartition.
    """
    import json
    import math
    import os
    import shutil
    import uuid

    if snapshot:
        from airflow_postgres_csv_spark.operators.snapshots import (
            _load_manifest,
            snapshot_compact,
            snapshot_versions,
        )

        versions = snapshot_versions(path)
        if not versions:
            raise FileNotFoundError(
                f"compact_dataset(snapshot=True): {path} is not a snapshot "
                "root (no manifests); use snapshot_commit to manage it first"
            )
        before = _load_manifest(path, versions[-1])["n_files"]
        m = snapshot_compact(spark, path, target_bytes=target_bytes)
        return {
            "files_before": before,
            "files_after": m["n_files"],
            "bytes": sum(
                os.path.getsize(os.path.join(path, rel)) for rel in m["files"]
            ),
            "rows": None,  # no extra verification scan: the commit is atomic
            "version": m["version"],
        }

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
    # the compacted copy is fully written + verified: record the swap so a
    # hard kill between the renames is recoverable (roll-forward)
    marker = f"{path.rstrip('/')}__swap.json"
    with open(marker, "w") as f:
        json.dump({"path": path, "old": old, "tmp": tmp}, f)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except Exception:
        # restore the original so `path` never stays missing; the compacted
        # copy is discarded (it was never observed).
        os.rename(old, path)
        shutil.rmtree(tmp, ignore_errors=True)
        os.remove(marker)
        raise
    shutil.rmtree(old)
    os.remove(marker)
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


def recover_compact_swap(path: str) -> str:
    """Recover a :func:`compact_dataset` directory swap interrupted by a
    hard kill. Reads the ``{path}__swap.json`` marker; if ``path`` is
    missing, rolls FORWARD to the compacted copy when it exists (it was
    fully written and row-verified before the marker was created), else
    rolls BACK to the original; then removes leftover staging dirs and the
    marker. Returns ``'forward'``, ``'back'``, or ``'clean'`` (no marker /
    nothing to do). Never deletes a staging dir while ``path`` is absent.
    """
    import json
    import os
    import shutil

    marker = f"{path.rstrip('/')}__swap.json"
    if not os.path.exists(marker):
        return "clean"
    with open(marker) as f:
        info = json.load(f)
    action = "clean"
    if not os.path.exists(path):
        if os.path.exists(info["tmp"]):
            os.rename(info["tmp"], path)
            action = "forward"
        elif os.path.exists(info["old"]):
            os.rename(info["old"], path)
            action = "back"
    if os.path.exists(path):
        for d in (info["old"], info["tmp"]):
            if d != path and os.path.exists(d):
                shutil.rmtree(d)
        os.remove(marker)
    return action
