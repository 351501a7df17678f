"""Maintenance advisor: metadata-only decisions for the four lakehouse
debt axes (small files, tombstones, unclustered commits, version
retention), each driven into its trigger state and back to healthy by
running the recommended op."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.maintenance import (
    snapshot_maintenance_plan,
)
from airflow_postgres_csv_spark.operators.snapshots import (
    snapshot_commit,
    snapshot_compact,
    snapshot_delete_mor,
    snapshot_expire,
    snapshot_optimize_incremental,
    snapshot_read,
)


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id", (F.col("id") % 32).alias("x"), (F.col("id") % 7).alias("y")
    )


def test_maintenance_plan_triggers_and_recovers(spark, tmp_path):
    root = str(tmp_path / "t")
    # many tiny commits -> small-file debt
    for k in range(6):
        snapshot_commit(_batch(spark, k * 100, (k + 1) * 100).coalesce(1), root)
    plan = snapshot_maintenance_plan(root, target_bytes=1 << 20)
    assert [a["action"] for a in plan["actions"]] == ["compact"]
    assert plan["metrics"]["small_files"] == plan["metrics"]["n_files"] == 6
    assert plan["metrics"]["unoptimized_commits"] is None  # never optimized

    # run the recommendation: healthy afterwards (one right-sized file)
    snapshot_compact(spark, root, target_bytes=1 << 30)
    plan = snapshot_maintenance_plan(root, target_bytes=16 * 1024)
    assert plan["actions"] == [] and plan["metrics"]["n_files"] == 1

    # tombstone debt (without small-file debt) -> compact for fold
    for i in range(4):
        snapshot_delete_mor(
            spark, root, condition=f"id = {i}", key_col="id"
        )
    plan = snapshot_maintenance_plan(
        root, target_bytes=16 * 1024, max_tombstones=4
    )
    assert [a["action"] for a in plan["actions"]] == ["compact"]
    assert "tombstones" in plan["actions"][0]["reason"]
    snapshot_compact(spark, root, target_bytes=1 << 30)
    assert snapshot_maintenance_plan(root, target_bytes=16 * 1024, max_versions=64)[
        "actions"
    ] == []


def test_maintenance_plan_optimize_and_expire_axes(spark, tmp_path):
    root = str(tmp_path / "t")
    for k in range(2):
        snapshot_commit(_batch(spark, k * 500, (k + 1) * 500), root)
    snapshot_optimize_incremental(
        spark, root, zorder_by=("x", "y"), target_bytes=1 << 30
    )
    # fresh unclustered commits since the optimize
    for k in range(3):
        snapshot_commit(
            _batch(spark, 1000 + k * 100, 1100 + k * 100).coalesce(1), root
        )
    plan = snapshot_maintenance_plan(
        root, target_bytes=1024, max_unoptimized_commits=3, max_versions=3
    )
    acts = {a["action"] for a in plan["actions"]}
    assert "optimize_incremental" in acts and "expire" in acts
    assert plan["metrics"]["unoptimized_commits"] == 3
    # run the recommendations: both axes recover
    snapshot_optimize_incremental(
        spark, root, zorder_by=("x", "y"), target_bytes=1 << 30
    )
    snapshot_expire(root, keep_last=2)
    plan = snapshot_maintenance_plan(
        root, target_bytes=1024, max_unoptimized_commits=3, max_versions=8
    )
    assert {a["action"] for a in plan["actions"]} == set()
    assert snapshot_read(spark, root).count() == 1300


def test_maintenance_plan_sketch_backfill_axis(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_commit(_batch(spark, 0, 300).coalesce(1), root)  # pre-config
    snapshot_commit(
        _batch(spark, 300, 600).coalesce(1), root, sketch_cols=["x"]
    )
    plan = snapshot_maintenance_plan(root, target_bytes=1024)
    assert [a["action"] for a in plan["actions"]] == ["sketch_backfill"]
    assert plan["metrics"]["sketch_gap_commits"] == 1
    snapshot_compact(spark, root, target_bytes=1 << 30)  # re-sketches
    plan = snapshot_maintenance_plan(root, target_bytes=1024, max_versions=64)
    assert plan["actions"] == []
    with pytest.raises(FileNotFoundError):
        snapshot_maintenance_plan(str(tmp_path / "missing"))
