"""Versioned-snapshot dataset queries (operators/snapshots.py): commit /
append / time-travel reproduced against plain-SQL oracles.

Each query stages a snapshot dataset in a temp dir from fixture rows,
exercises the manifest machinery, and returns a result whose oracle is
ordinary SQL over the source table — the round trip through commit →
manifest → pinned read must be lossless, and time travel must return
exactly the rows of the pinned version regardless of later commits.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.catalog import load
from airflow_postgres_csv_spark.operators.snapshots import (
    snapshot_commit,
    snapshot_read,
    snapshot_versions,
)
from airflow_postgres_csv_spark.queries import register

_SPLIT_KEY = 13  # nation: v1 = keys < 13 (13 rows), v2 appends the rest


def _staged_versions(spark: SparkSession, sf_dir: str, root: str) -> None:
    nation = load(spark, sf_dir, "nation")
    snapshot_commit(nation.where(F.col("n_nationkey") < _SPLIT_KEY), root)
    snapshot_commit(nation.where(F.col("n_nationkey") >= _SPLIT_KEY), root)


def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only history; reading version 1 after version 2 committed
    returns exactly v1's rows — the pinned file list, not directory state."""
    root = tempfile.mkdtemp(prefix="spark_graft_snap_")
    try:
        _staged_versions(spark, sf_dir, root)
        out = snapshot_read(spark, root, version=1).cache()
        out.count()  # materialize before the temp dir disappears
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out.orderBy("n_nationkey")


register(
    "snapshot_time_travel",
    f"SELECT * FROM nation WHERE n_nationkey < {_SPLIT_KEY} ORDER BY n_nationkey",
)(snapshot_time_travel)


def snapshot_read_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest = v1 files + v2 files: the append union equals the source."""
    root = tempfile.mkdtemp(prefix="spark_graft_snap_")
    try:
        _staged_versions(spark, sf_dir, root)
        out = snapshot_read(spark, root).cache()
        out.count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out.orderBy("n_nationkey")


register(
    "snapshot_read_latest",
    "SELECT * FROM nation ORDER BY n_nationkey",
)(snapshot_read_latest)


def snapshot_version_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row count per committed version (v1 partial, v2 append-complete,
    v3 overwrite back to the partial set) — commit/lineage bookkeeping as a
    relation. File counts are layout-dependent, so the deterministic
    observable is the row count of each pinned read."""
    nation = load(spark, sf_dir, "nation")
    root = tempfile.mkdtemp(prefix="spark_graft_snap_")
    rows = []
    try:
        _staged_versions(spark, sf_dir, root)
        snapshot_commit(
            nation.where(F.col("n_nationkey") < _SPLIT_KEY), root, mode="overwrite"
        )
        for v in snapshot_versions(root):
            rows.append((v, snapshot_read(spark, root, version=v).count()))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, "version int, n_rows bigint").orderBy("version")


register(
    "snapshot_version_history",
    f"""
    SELECT 1 AS version, (SELECT COUNT(*) FROM nation WHERE n_nationkey < {_SPLIT_KEY}) AS n_rows
    UNION ALL
    SELECT 2, (SELECT COUNT(*) FROM nation)
    UNION ALL
    SELECT 3, (SELECT COUNT(*) FROM nation WHERE n_nationkey < {_SPLIT_KEY})
    ORDER BY version
    """,
)(snapshot_version_history)
