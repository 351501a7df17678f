"""Model-based property test for the snapshot subsystem: random operation
sequences (append / MOR-delete / positional-delete / COW-delete / merge /
compact / rollback) against a plain-Python multiset model.

Two invariants, checked by hypothesis over generated histories:

1. After every operation, ``snapshot_read(latest)`` equals the model —
   whatever interleaving of tombstone kinds, rewrites, and rollbacks
   produced it.
2. After the whole sequence, EVERY historical version still reads as the
   model state it had when committed (time travel is never corrupted by
   later commits, rewrites, or tombstone inheritance).

Rows are (id, stamp) pairs where ``stamp`` is the appending op's index,
so duplicate ids from different appends are distinguishable and
positional deletes can target one copy of a duplicated key — the case
equality tombstones cannot express.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st

from airflow_postgres_csv_spark.operators.snapshots import (
    snapshot_alter,
    snapshot_commit,
    snapshot_compact,
    snapshot_delete,
    snapshot_delete_mor,
    snapshot_delete_positional,
    snapshot_merge,
    snapshot_merge_into,
    snapshot_read,
    snapshot_rollback,
    snapshot_versions,
)

IDS = 12  # small key domain so deletes/merges collide with appends

_op = st.one_of(
    st.tuples(st.just("append"), st.integers(0, IDS - 3), st.integers(1, 4)),
    st.tuples(st.just("delete_mor"), st.integers(0, IDS - 1)),
    st.tuples(
        st.just("delete_pos"), st.integers(0, IDS - 1), st.integers(0, 7)
    ),
    st.tuples(
        st.just("cow_delete"), st.integers(0, IDS - 1), st.integers(0, 3)
    ),
    st.tuples(st.just("merge"), st.integers(0, IDS - 3), st.integers(1, 3)),
    st.tuples(
        st.just("merge_into"), st.integers(0, IDS - 3), st.integers(1, 3),
        st.integers(0, 2), st.integers(0, 4),
    ),
    st.tuples(st.just("merge_sync"), st.integers(0, IDS - 3), st.integers(1, 4)),
    st.tuples(st.just("compact")),
    st.tuples(st.just("rename")),
    st.tuples(st.just("rollback"), st.integers(0, 30)),
    st.tuples(
        st.just("txn"), st.integers(0, IDS - 3), st.integers(1, 3),
        st.integers(0, IDS),
    ),
    st.tuples(st.just("wap_fail"), st.integers(0, IDS - 3), st.integers(1, 3)),
    # declared constraint lifecycle: toggle "id >= 0" on/off, and an
    # append of NEGATIVE ids that must be rejected exactly while it is on
    st.tuples(st.just("con_on")),
    st.tuples(st.just("con_off")),
    st.tuples(st.just("append_neg"), st.integers(0, 5), st.integers(1, 3)),
)


def _apply_merge_into(spark, root, model, opi, lo, n, dm, um, col="stamp"):
    """MERGE INTO with per-key DELETE (s.id%3=dm) / UPDATE (s.id%5=um) /
    unconditional INSERT clauses — returns the updated multiset model.
    Updates preserve copy multiplicity (every copy of a matched key gets
    the new stamp), unlike snapshot_merge's replace-with-one upsert."""
    src = [(i, opi) for i in range(lo, lo + n)]
    snapshot_merge_into(
        spark, root,
        spark.createDataFrame(src, f"id long, {col} long").coalesce(1),
        key="id",
        matched_update={col: f"s.{col}"},
        matched_update_condition=f"s.id % 5 = {um}",
        matched_delete_condition=f"s.id % 3 = {dm}",
    )
    src_ids = {i for i, _ in src}
    existing = {r[0] for r in model}
    out = []
    for r in model:
        if r[0] in src_ids:
            if r[0] % 3 == dm:
                continue
            out.append((r[0], opi) if r[0] % 5 == um else r)
        else:
            out.append(r)
    return out + [(i, opi) for i in sorted(src_ids - existing)]


def _apply_merge_sync(spark, root, model, opi, lo, n, col="stamp"):
    """Sync-to-source MERGE: matched keys updated, keys absent from the
    source deleted when their stamp is even, no inserts."""
    src = [(i, opi) for i in range(lo, lo + n)]
    snapshot_merge_into(
        spark, root,
        spark.createDataFrame(src, f"id long, {col} long").coalesce(1),
        key="id",
        matched_update={col: f"s.{col}"},
        insert_when_not_matched=False,
        not_matched_by_source_delete=f"t.{col} % 2 = 0",
    )
    src_ids = {i for i, _ in src}
    out = []
    for r in model:
        if r[0] in src_ids:
            out.append((r[0], opi))
        elif r[1] % 2 == 0:
            continue
        else:
            out.append(r)
    return out


def _snapshot_rows(spark, root, version=None, col="stamp"):
    df = snapshot_read(spark, root, version=version)
    return sorted((r["id"], r[col]) for r in df.collect())


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=3, max_size=7))
@pytest.mark.slow
def test_random_histories_match_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("snapmodel") / "snap")
    # model: multiset of (id, stamp); history[v] = model after version v
    model: list[tuple[int, int]] = []
    history: dict[int, list[tuple[int, int]]] = {}
    # version 1 seeds the table so every op kind is applicable
    model = [(i, 0) for i in range(IDS)]
    snapshot_commit(
        spark.createDataFrame(model, "id long, stamp long").coalesce(1), root
    )
    history[1] = sorted(model)
    # ALTER RENAME interleaves with every other op: the value column's
    # CURRENT name evolves (stamp -> s<opi> -> ...), per-version names
    # are tracked so time travel asserts under each version's own name
    cur_col = "stamp"
    col_at: dict[int, str] = {1: cur_col}
    con_on = False  # declared constraint "id >= 0" currently active
    rejected = False  # this op was refused: no version, state unchanged
    for opi, op in enumerate(ops, start=1):
        kind = op[0]
        rejected = False
        if kind == "append":
            _, lo, n = op
            rows = [(i, opi) for i in range(lo, lo + n)]
            snapshot_commit(
                spark.createDataFrame(
                    rows, f"id long, {cur_col} long"
                ).coalesce(1),
                root,
            )
            model = model + rows
        elif kind == "delete_mor":
            _, k = op
            snapshot_delete_mor(spark, root, f"id = {k}", key_col="id")
            model = [r for r in model if r[0] != k]
        elif kind == "delete_pos":
            _, k, s = op
            snapshot_delete_positional(
                spark, root, f"id = {k} AND {cur_col} = {s}"
            )
            model = [r for r in model if not (r[0] == k and r[1] == s)]
        elif kind == "cow_delete":
            _, lo, w = op
            snapshot_delete(spark, root, "id", lo, lo + w)
            model = [r for r in model if not (lo <= r[0] <= lo + w)]
        elif kind == "merge":
            _, lo, n = op
            rows = [(i, opi) for i in range(lo, lo + n)]
            snapshot_merge(
                spark,
                root,
                spark.createDataFrame(
                    rows, f"id long, {cur_col} long"
                ).coalesce(1),
                key="id",
            )
            keys = {i for i, _ in rows}
            model = [r for r in model if r[0] not in keys] + rows
        elif kind == "merge_into":
            _, lo, n, dm, um = op
            model = _apply_merge_into(
                spark, root, model, opi, lo, n, dm, um, col=cur_col
            )
        elif kind == "merge_sync":
            _, lo, n = op
            model = _apply_merge_sync(spark, root, model, opi, lo, n, col=cur_col)
        elif kind == "txn":
            # multi-statement transaction: append + (sometimes) an
            # equality delete, published as ONE atomic main version —
            # interleaves branch publish with every other op kind
            from airflow_postgres_csv_spark.operators.branches import (
                snapshot_transaction,
            )

            _, lo, n, dk = op
            rows = [(i, opi) for i in range(lo, lo + n)]
            with snapshot_transaction(root) as txn:
                snapshot_commit(
                    spark.createDataFrame(
                        rows, f"id long, {cur_col} long"
                    ).coalesce(1),
                    txn,
                )
                model = model + rows
                if dk < IDS:
                    snapshot_delete_mor(spark, txn, f"id = {dk}", key_col="id")
                    model = [r for r in model if r[0] != dk]
        elif kind == "wap_fail":
            # failed aggregate audit: main must be untouched
            from airflow_postgres_csv_spark.operators.branches import (
                AuditError,
                snapshot_drop_branch,
                write_audit_publish,
            )

            _, lo, n = op
            rows = [(i, opi) for i in range(lo, lo + n)]
            try:
                write_audit_publish(
                    spark, root,
                    spark.createDataFrame(
                        rows, f"id long, {cur_col} long"
                    ).coalesce(1),
                    audits={"impossible": "count(*) < 0"},
                    branch=f"q{opi}",
                )
                raise AssertionError("audit must fail")
            except AuditError:
                snapshot_drop_branch(root, f"q{opi}")
        elif kind == "compact":
            snapshot_compact(spark, root)
        elif kind == "rename":
            new = f"s{opi}"
            snapshot_alter(root, rename={cur_col: new})
            cur_col = new  # zero-data commit; the model rows are unchanged
        elif kind == "rollback":
            _, j = op
            versions = snapshot_versions(root)
            target = versions[j % len(versions)]
            if con_on and any(r[0] < 0 for r in history[target]):
                # the rollback would RESURRECT constraint-violating rows:
                # it must refuse and change nothing
                from airflow_postgres_csv_spark.operators.snapshots import (
                    SnapshotExpectationError,
                )

                try:
                    snapshot_rollback(spark, root, target)
                    raise AssertionError("rollback must refuse")
                except SnapshotExpectationError:
                    rejected = True
            else:
                snapshot_rollback(spark, root, target)
                model = list(history[target])
                cur_col = col_at[target]  # the target version's own name
        elif kind == "con_on":
            from airflow_postgres_csv_spark.operators.snapshots import (
                SnapshotExpectationError,
                snapshot_add_constraint,
            )

            if con_on:
                rejected = True  # no-op: already declared
            elif any(r[0] < 0 for r in model):
                # live violating rows: declaration must refuse
                try:
                    snapshot_add_constraint(spark, root, "id_nonneg", "id >= 0")
                    raise AssertionError("add_constraint must refuse")
                except SnapshotExpectationError:
                    rejected = True
            else:
                snapshot_add_constraint(spark, root, "id_nonneg", "id >= 0")
                con_on = True
        elif kind == "con_off":
            from airflow_postgres_csv_spark.operators.snapshots import (
                snapshot_drop_constraint,
            )

            if con_on:
                snapshot_drop_constraint(root, "id_nonneg")
                con_on = False
            else:
                rejected = True  # no-op: nothing declared
        elif kind == "append_neg":
            _, lo, n = op
            rows = [(-(lo + k + 1), opi) for k in range(n)]
            df = spark.createDataFrame(
                rows, f"id long, {cur_col} long"
            ).coalesce(1)
            if con_on:
                from airflow_postgres_csv_spark.operators.snapshots import (
                    SnapshotExpectationError,
                )

                try:
                    snapshot_commit(df, root)
                    raise AssertionError("negative append must be rejected")
                except SnapshotExpectationError:
                    rejected = True
            else:
                snapshot_commit(df, root)
                model = model + rows
        if rejected:
            # refused ops create no version and mutate nothing
            assert _snapshot_rows(spark, root, col=cur_col) == history[
                snapshot_versions(root)[-1]
            ], f"rejected op {opi} {op} mutated the table"
            continue
        if kind == "wap_fail":
            # no version was created; latest must still match the model
            assert _snapshot_rows(spark, root, col=cur_col) == history[
                snapshot_versions(root)[-1]
            ], f"wap_fail mutated main at op {opi}"
            continue
        v = snapshot_versions(root)[-1]
        history[v] = sorted(model)
        col_at[v] = cur_col
        assert _snapshot_rows(spark, root, col=cur_col) == history[v], (
            f"latest mismatch after op {opi} {op}"
        )
    # time travel: every version still reads as the state it pinned,
    # under that version's OWN column names
    for v, expect in history.items():
        assert _snapshot_rows(spark, root, version=v, col=col_at[v]) == expect, (
            f"time travel to v{v} diverged"
        )


@pytest.mark.slow
def test_concurrent_committers_threads_no_lost_commits(spark, tmp_path):
    """Real-thread race: 6 writers × 2 commits each against one root,
    retrying on SnapshotConflictError. First-writer-wins must serialize
    them into a linear history with no lost commits and no duplicate
    rows — 12 appends, every row delivered exactly once."""
    import threading

    from airflow_postgres_csv_spark.operators.snapshots import (
        SnapshotConflictError,
    )

    root = str(tmp_path / "snap")
    n_writers, n_commits = 6, 2
    errors: list[Exception] = []

    def writer(w: int) -> None:
        try:
            for c in range(n_commits):
                lo = (w * n_commits + c) * 100
                df = spark.createDataFrame(
                    [(i, w) for i in range(lo, lo + 10)], "id long, stamp long"
                ).coalesce(1)
                for _ in range(200):
                    try:
                        snapshot_commit(df, root)
                        break
                    except SnapshotConflictError:
                        continue
                else:
                    raise RuntimeError("retry budget exhausted")
        except Exception as e:  # surfaced to the main thread
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(n_writers)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
    versions = snapshot_versions(root)
    assert versions == list(range(1, n_writers * n_commits + 1))
    rows = sorted(r["id"] for r in snapshot_read(spark, root).collect())
    expect = sorted(
        i
        for w in range(n_writers)
        for c in range(n_commits)
        for i in range((w * n_commits + c) * 100, (w * n_commits + c) * 100 + 10)
    )
    assert rows == expect


_cdf_op = st.one_of(
    st.tuples(st.just("append"), st.integers(0, IDS - 3), st.integers(1, 4)),
    st.tuples(st.just("delete_mor"), st.integers(0, IDS - 1)),
    st.tuples(
        st.just("delete_pos"), st.integers(0, IDS - 1), st.integers(0, 7)
    ),
    st.tuples(
        st.just("cow_delete"), st.integers(0, IDS - 1), st.integers(0, 3)
    ),
    st.tuples(st.just("merge"), st.integers(0, IDS - 3), st.integers(1, 3)),
    st.tuples(
        st.just("merge_into"), st.integers(0, IDS - 3), st.integers(1, 3),
        st.integers(0, 2), st.integers(0, 4),
    ),
    st.tuples(st.just("merge_sync"), st.integers(0, IDS - 3), st.integers(1, 4)),
    st.tuples(st.just("compact")),
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_cdf_op, min_size=3, max_size=6))
@pytest.mark.slow
def test_change_feed_reconstructs_every_version(spark, tmp_path_factory, ops):
    """CDF soundness as a model property: over random histories of every
    feed-expressible commit kind, net-applying the batch change feed
    (insert +1 / delete -1 on exact rows) through version v reconstructs
    exactly the live row multiset snapshot_read pins at v — so a keyed
    consumer replaying the feed can never diverge from the table."""
    from collections import Counter

    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_table_changes,
    )

    root = str(tmp_path_factory.mktemp("snapcdf") / "snap")
    model = [(i, 0) for i in range(IDS)]
    snapshot_commit(
        spark.createDataFrame(model, "id long, stamp long").coalesce(1), root
    )
    history = {1: sorted(model)}
    for opi, op in enumerate(ops, start=1):
        kind = op[0]
        if kind == "append":
            _, lo, n = op
            rows = [(i, opi) for i in range(lo, lo + n)]
            snapshot_commit(
                spark.createDataFrame(rows, "id long, stamp long").coalesce(1),
                root,
            )
            model = model + rows
        elif kind == "delete_mor":
            _, k = op
            snapshot_delete_mor(spark, root, f"id = {k}", key_col="id")
            model = [r for r in model if r[0] != k]
        elif kind == "delete_pos":
            _, k, s = op
            snapshot_delete_positional(spark, root, f"id = {k} AND stamp = {s}")
            model = [r for r in model if not (r[0] == k and r[1] == s)]
        elif kind == "cow_delete":
            _, lo, w = op
            snapshot_delete(spark, root, "id", lo, lo + w)
            model = [r for r in model if not (lo <= r[0] <= lo + w)]
        elif kind == "merge":
            _, lo, n = op
            rows = [(i, opi) for i in range(lo, lo + n)]
            snapshot_merge(
                spark,
                root,
                spark.createDataFrame(rows, "id long, stamp long").coalesce(1),
                key="id",
            )
            keys = {i for i, _ in rows}
            model = [r for r in model if r[0] not in keys] + rows
        elif kind == "merge_into":
            _, lo, n, dm, um = op
            model = _apply_merge_into(spark, root, model, opi, lo, n, dm, um)
        elif kind == "merge_sync":
            _, lo, n = op
            model = _apply_merge_sync(spark, root, model, opi, lo, n)
        elif kind == "txn":
            # multi-statement transaction: append + (sometimes) an
            # equality delete, published as ONE atomic main version —
            # interleaves branch publish with every other op kind
            from airflow_postgres_csv_spark.operators.branches import (
                snapshot_transaction,
            )

            _, lo, n, dk = op
            rows = [(i, opi) for i in range(lo, lo + n)]
            with snapshot_transaction(root) as txn:
                snapshot_commit(
                    spark.createDataFrame(
                        rows, "id long, stamp long"
                    ).coalesce(1),
                    txn,
                )
                model = model + rows
                if dk < IDS:
                    snapshot_delete_mor(spark, txn, f"id = {dk}", key_col="id")
                    model = [r for r in model if r[0] != dk]
        elif kind == "wap_fail":
            # failed aggregate audit: main must be untouched
            from airflow_postgres_csv_spark.operators.branches import (
                AuditError,
                snapshot_drop_branch,
                write_audit_publish,
            )

            _, lo, n = op
            rows = [(i, opi) for i in range(lo, lo + n)]
            try:
                write_audit_publish(
                    spark, root,
                    spark.createDataFrame(
                        rows, "id long, stamp long"
                    ).coalesce(1),
                    audits={"impossible": "count(*) < 0"},
                    branch=f"q{opi}",
                )
                raise AssertionError("audit must fail")
            except AuditError:
                snapshot_drop_branch(root, f"q{opi}")
        elif kind == "compact":
            snapshot_compact(spark, root)
        history[snapshot_versions(root)[-1]] = sorted(model)
    latest = snapshot_versions(root)[-1]
    changes = snapshot_table_changes(spark, root, 0, latest).collect()
    by_version: dict[int, list] = {}
    for r in changes:
        by_version.setdefault(r["_commit_version"], []).append(r)
    net: Counter = Counter()
    reconstructed_at = {}
    for v in range(1, latest + 1):
        for r in by_version.get(v, []):
            row = (r["id"], r["stamp"])
            net[row] += 1 if r["_change_type"] == "insert" else -1
        reconstructed_at[v] = sorted(
            row for row, c in net.items() for _ in range(c)
        )
        assert all(c >= 0 for c in net.values()), (v, net)
    for v, expect in history.items():
        assert reconstructed_at[v] == expect, (
            f"CDF replay diverged at v{v}: {reconstructed_at[v]} != {expect}"
        )
