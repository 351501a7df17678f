"""Declared table constraints (Delta's ADD CONSTRAINT): boolean SQL
rules stored in the manifest, validated against the live table when
added, enforced on every value-introducing write from then on, carried
through compaction / rollback / clone / branches, and protected against
column drops/renames that would orphan them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.snapshots import (
    SnapshotExpectationError,
    snapshot_add_constraint,
    snapshot_alter,
    snapshot_commit,
    snapshot_compact,
    snapshot_drop_constraint,
    snapshot_merge,
    snapshot_merge_into,
    snapshot_read,
    snapshot_rollback,
    snapshot_update,
    snapshot_versions,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long").coalesce(1)


def _table(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_commit(_df(spark, [(i, i * 10) for i in range(5)]), root)
    snapshot_add_constraint(spark, root, "v_nonneg", "v >= 0")
    snapshot_add_constraint(spark, root, "id_set", "id IS NOT NULL")
    return root


def test_add_validates_existing_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_commit(_df(spark, [(1, -5), (2, 3)]), root)
    with pytest.raises(SnapshotExpectationError):
        snapshot_add_constraint(spark, root, "v_nonneg", "v >= 0")
    # passing rule declares fine; duplicate name refused
    snapshot_add_constraint(spark, root, "id_pos", "id > 0")
    with pytest.raises(ValueError, match="already declared"):
        snapshot_add_constraint(spark, root, "id_pos", "id > 1")


def test_append_and_overwrite_enforced(spark, tmp_path):
    root = _table(spark, tmp_path)
    with pytest.raises(SnapshotExpectationError):
        snapshot_commit(_df(spark, [(9, -1)]), root)
    with pytest.raises(SnapshotExpectationError):
        snapshot_commit(_df(spark, [(9, -1)]), root, mode="overwrite")
    # the table is unchanged and fully readable after the aborts
    assert snapshot_read(spark, root).count() == 5
    snapshot_commit(_df(spark, [(9, 1)]), root)
    assert snapshot_read(spark, root).count() == 6


@pytest.mark.slow
def test_merge_paths_enforced(spark, tmp_path):
    root = _table(spark, tmp_path)
    with pytest.raises(SnapshotExpectationError):
        snapshot_merge(spark, root, _df(spark, [(1, -99)]), key="id")
    with pytest.raises(SnapshotExpectationError):
        snapshot_merge_into(
            spark, root, _df(spark, [(1, -99)]), key="id",
            matched_update={"v": "s.v"},
        )
    with pytest.raises(SnapshotExpectationError):
        snapshot_update(
            spark, root, condition="id = 1", set_exprs={"v": "-7"},
            key_col="id",
        )
    # the good path still works and the bad attempts left no debris
    snapshot_merge(spark, root, _df(spark, [(1, 99)]), key="id")
    got = {r.id: r.v for r in snapshot_read(spark, root).collect()}
    assert got[1] == 99 and min(got.values()) >= 0


@pytest.mark.slow
def test_constraints_survive_compact_rollback_and_drop(spark, tmp_path):
    root = _table(spark, tmp_path)
    snapshot_commit(_df(spark, [(7, 70)]), root)
    snapshot_compact(spark, root, target_bytes=1 << 30)
    with pytest.raises(SnapshotExpectationError):
        snapshot_commit(_df(spark, [(8, -8)]), root)
    snapshot_rollback(spark, root, snapshot_versions(root)[0])
    with pytest.raises(SnapshotExpectationError):
        snapshot_commit(_df(spark, [(8, -8)]), root)
    snapshot_drop_constraint(root, "v_nonneg")
    snapshot_commit(_df(spark, [(8, -8)]), root)  # now allowed
    with pytest.raises(KeyError):
        snapshot_drop_constraint(root, "nope")


def test_alter_refuses_touching_constrained_columns(spark, tmp_path):
    root = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="declared constraint"):
        snapshot_alter(root, drop=["v"])
    with pytest.raises(ValueError, match="declared constraint"):
        snapshot_alter(root, rename={"v": "w"})
    snapshot_drop_constraint(root, "v_nonneg")
    snapshot_alter(root, rename={"v": "w"})  # unblocked


@pytest.mark.slow
def test_staged_datasource_write_enforced(spark, tmp_path):
    from airflow_postgres_csv_spark.sources.snapshot_batch import (
        register_snapshot_table,
    )

    root = _table(spark, tmp_path)
    register_snapshot_table(spark)
    bad = _df(spark, [(11, -1)])
    with pytest.raises(Exception, match="v_nonneg"):
        bad.write.format("snapshot_table").mode("append").save(root)
    assert snapshot_read(spark, root).count() == 5
    _df(spark, [(11, 1)]).write.format("snapshot_table").mode(
        "append"
    ).save(root)
    assert snapshot_read(spark, root).count() == 6


@pytest.mark.slow
def test_rollback_resurrecting_violations_refused(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_delete,
    )

    root = str(tmp_path / "t")
    snapshot_commit(_df(spark, [(1, -5), (2, 3)]), root)  # v1 has a bad row
    snapshot_delete(spark, root, "v", -100, -1)  # v2 cleans it
    snapshot_add_constraint(spark, root, "v_nonneg", "v >= 0")
    with pytest.raises(SnapshotExpectationError):
        snapshot_rollback(spark, root, 1)  # would resurrect (1, -5)
    # the clean version rolls back fine, constraint retained
    snapshot_rollback(spark, root, 2)
    with pytest.raises(SnapshotExpectationError):
        snapshot_commit(_df(spark, [(3, -1)]), root)


@pytest.mark.slow
def test_rollback_validation_scans_only_resurrected_files(
    spark, tmp_path, monkeypatch
):
    """Append-only rollback resurrects nothing → the constraint check
    must be a ZERO-scan metadata decision (O(delta) discipline)."""
    from airflow_postgres_csv_spark.operators import snapshots as S

    root = _table(spark, tmp_path)
    snapshot_commit(_df(spark, [(7, 70)]), root)

    def bomb(*a, **k):
        raise AssertionError("data scan on an append-only rollback")

    monkeypatch.setattr(S, "_read_pinned", bomb)
    snapshot_rollback(spark, root, snapshot_versions(root)[0])
    monkeypatch.undo()
    # constraints retained: the gate still closes
    with pytest.raises(SnapshotExpectationError):
        snapshot_commit(_df(spark, [(8, -8)]), root)


@pytest.mark.slow
def test_constraints_survive_branch_publish(spark, tmp_path):
    """Fast-forward publishing a branch must carry the declared
    constraints onto main (they were absent from the carry list)."""
    from airflow_postgres_csv_spark.operators.branches import (
        snapshot_branch,
        snapshot_publish_branch,
    )

    root = _table(spark, tmp_path)
    snapshot_branch(root, "exp")
    from airflow_postgres_csv_spark.operators import branches as B

    broot = B._branch_root(root, "exp")
    # the branch enforces too (manifest clone carries the rules)
    with pytest.raises(SnapshotExpectationError):
        snapshot_commit(_df(spark, [(9, -1)]), broot)
    snapshot_commit(_df(spark, [(9, 9)]), broot)
    snapshot_publish_branch(root, "exp")
    # main still enforces after the fast-forward
    with pytest.raises(SnapshotExpectationError):
        snapshot_commit(_df(spark, [(10, -1)]), root)
    assert snapshot_read(spark, root).count() == 6


@pytest.mark.slow
def test_rebase_enforces_constraint_declared_by_winner(
    spark, tmp_path, monkeypatch
):
    """A writer that computed its rules from the old head and loses the
    version race must re-gate its staged files against any constraint
    the WINNER declared — the rebase cannot bypass a rule that was live
    at publish time."""
    from airflow_postgres_csv_spark.operators import snapshots as S

    root = str(tmp_path / "t")
    snapshot_commit(_df(spark, [(1, 1)]), root)
    real_publish = S._publish
    state = {"fired": False}

    names = iter(["v_nonneg", "v_small"])
    exprs = {"v_nonneg": "v >= 0", "v_small": "v <= 100"}

    def racing_publish(r, versions, body, commit_id, sidecar, **kw):
        if not state["fired"] and body.get("mode") == "append" and r == root:
            state["fired"] = True
            # the winner declares a constraint first — our caller's
            # version target is now taken AND the rules changed
            cname = next(names)
            snapshot_add_constraint(spark, root, cname, exprs[cname])
            raise S.SnapshotConflictError("lost the race (injected)")
        return real_publish(r, versions, body, commit_id, sidecar, **kw)

    monkeypatch.setattr(S, "_publish", racing_publish)
    with pytest.raises(SnapshotExpectationError):
        snapshot_commit(_df(spark, [(2, -9)]), root, retries=1)
    monkeypatch.undo()
    assert snapshot_read(spark, root).count() == 1  # nothing landed
    # and a CLEAN batch rebases through the same race just fine
    state["fired"] = False
    monkeypatch.setattr(S, "_publish", racing_publish)
    snapshot_commit(_df(spark, [(3, 9)]), root, retries=1)
    monkeypatch.undo()
    assert snapshot_read(spark, root).count() == 2


@pytest.mark.slow
def test_rollback_does_not_resurrect_dropped_constraints(spark, tmp_path):
    """HEAD-wins on the declaration set even when it is EMPTY: rolling
    back to a version that carried a constraint must not re-declare a
    rule an explicit drop removed."""
    root = str(tmp_path / "t")
    snapshot_commit(_df(spark, [(1, 1)]), root)
    snapshot_add_constraint(spark, root, "v_nonneg", "v >= 0")
    v_constrained = snapshot_versions(root)[-1]
    snapshot_drop_constraint(root, "v_nonneg")
    snapshot_rollback(spark, root, v_constrained)
    # the rule stays dropped: a violating append now lands
    snapshot_commit(_df(spark, [(2, -1)]), root)
    assert snapshot_read(spark, root).count() == 2
