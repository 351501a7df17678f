"""Multi-table atomic transactions (operators/catalog_txn.py): the
both-or-nothing contract, crash window, rebase concurrency, and catalog
time travel."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.catalog_txn import (
    CatalogConflictError,
    catalog_pin_tables,
    catalog_read,
    catalog_state,
    catalog_txn,
    catalog_versions,
)
from airflow_postgres_csv_spark.operators.snapshots import (
    snapshot_commit,
    snapshot_versions,
)


def _dfs(spark, lo, hi):
    a = spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))
    b = spark.range(lo, hi).select("id", (F.col("id") * 3).alias("w"))
    return a, b


def test_txn_flips_both_tables_atomically(spark, tmp_path):
    cat = str(tmp_path / "cat")
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    a1, b1 = _dfs(spark, 0, 100)
    m1 = catalog_txn(
        cat,
        [{"name": "a", "root": ra, "df": a1}, {"name": "b", "root": rb, "df": b1}],
    )
    assert m1["version"] == 1
    a2, b2 = _dfs(spark, 100, 250)
    m2 = catalog_txn(
        cat,
        [{"name": "a", "root": ra, "df": a2}, {"name": "b", "root": rb, "df": b2}],
    )
    assert m2["version"] == 2
    # latest catalog: both tables at their txn-2 state
    assert catalog_read(spark, cat, "a").count() == 250
    assert catalog_read(spark, cat, "b").count() == 250
    # catalog time travel: txn-1's mutually consistent view
    assert catalog_read(spark, cat, "a", catalog_version=1).count() == 100
    assert catalog_read(spark, cat, "b", catalog_version=1).count() == 100


def test_crash_between_table_commit_and_catalog_flip_is_invisible(spark, tmp_path):
    cat = str(tmp_path / "cat")
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    a1, b1 = _dfs(spark, 0, 50)
    catalog_txn(
        cat,
        [{"name": "a", "root": ra, "df": a1}, {"name": "b", "root": rb, "df": b1}],
    )
    # simulated crash: table a's snapshot commit lands, catalog never flips
    a2, _ = _dfs(spark, 50, 80)
    snapshot_commit(a2, ra)
    assert snapshot_versions(ra)[-1] == 2  # durable, time-travel-valid
    # catalog readers still see the consistent txn-1 world for BOTH tables
    assert catalog_read(spark, cat, "a").count() == 50
    assert catalog_read(spark, cat, "b").count() == 50
    assert len(catalog_versions(cat)) == 1
    # a guarded re-run REFUSES to stack on the orphaned append (its files
    # would ride into the retried commit's lineage — double-applied rows)
    from airflow_postgres_csv_spark.operators.snapshots import (
        SnapshotConflictError,
        snapshot_rollback,
    )

    a3, b3 = _dfs(spark, 50, 80)
    with pytest.raises(SnapshotConflictError):
        catalog_txn(
            cat,
            [
                {"name": "a", "root": ra, "df": a3},
                {"name": "b", "root": rb, "df": b3},
            ],
            expect_pinned=True,
        )
    assert len(catalog_versions(cat)) == 1  # still nothing published
    # recovery: roll table a back to its pinned state (forward commit),
    # adopt the rollback version in the catalog, then retry the txn
    rb_manifest = snapshot_rollback(spark, ra, 1)
    catalog_pin_tables(cat, {"a": (ra, rb_manifest["version"])})
    a4, b4 = _dfs(spark, 50, 80)
    catalog_txn(
        cat,
        [
            {"name": "a", "root": ra, "df": a4},
            {"name": "b", "root": rb, "df": b4},
        ],
        expect_pinned=True,
    )
    assert catalog_read(spark, cat, "a").count() == 80
    assert catalog_read(spark, cat, "b").count() == 80


def test_pin_rebase_carries_forward_disjoint_tables(spark, tmp_path):
    cat = str(tmp_path / "cat")
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    a1, b1 = _dfs(spark, 0, 10)
    snapshot_commit(a1, ra)
    snapshot_commit(b1, rb)
    _, b2 = _dfs(spark, 10, 20)
    snapshot_commit(b2, rb)  # b has versions 1 and 2
    a2, _ = _dfs(spark, 10, 20)
    snapshot_commit(a2, ra)  # a has versions 1 and 2
    catalog_pin_tables(cat, {"a": (ra, 1), "b": (rb, 1)})

    import airflow_postgres_csv_spark.operators.catalog_txn as C

    real_publish = C._publish_catalog
    raced = {"done": False}

    def racing_publish(root, versions, tables, txn_id, note, extra=None):
        # a concurrent txn wins the next version moving ONLY table b
        if not raced["done"]:
            raced["done"] = True
            winner = dict(catalog_state(cat))
            winner["b"] = {"root": os.path.abspath(rb), "version": 2}
            real_publish(root, versions, winner, "race", "")
        return real_publish(root, versions, tables, txn_id, note, extra=extra)

    C._publish_catalog = racing_publish
    try:
        m = catalog_pin_tables(cat, {"a": (ra, 2)}, retries=2)
    finally:
        C._publish_catalog = real_publish
    # rebase succeeded: our pin applied on top, the winner's b carried
    assert m["tables"]["a"]["version"] == 2
    assert m["tables"]["b"]["version"] == 2
    assert catalog_state(cat)["a"]["version"] == 2


def test_pin_conflict_on_same_table_raises(spark, tmp_path):
    cat = str(tmp_path / "cat")
    ra, _ = str(tmp_path / "a"), None
    a1, _ = _dfs(spark, 0, 10)
    snapshot_commit(a1, ra)
    a2, _ = _dfs(spark, 10, 20)
    snapshot_commit(a2, ra)
    catalog_pin_tables(cat, {"a": (ra, 1)})

    import airflow_postgres_csv_spark.operators.catalog_txn as C

    real_publish = C._publish_catalog
    raced = {"done": False}

    def racing_publish(root, versions, tables, txn_id, note, extra=None):
        if not raced["done"]:
            raced["done"] = True
            real_publish(root, versions, dict(tables, a={"root": os.path.abspath(ra), "version": 2}), "race", "")
        return real_publish(root, versions, tables, txn_id, note, extra=extra)

    C._publish_catalog = racing_publish
    try:
        with pytest.raises(CatalogConflictError):
            catalog_pin_tables(cat, {"a": (ra, 2)}, retries=2)
    finally:
        C._publish_catalog = real_publish


def test_catalog_version_is_o_tables_metadata(spark, tmp_path):
    """The catalog version holds pins only — its byte size must not grow
    with row counts or file counts of the tables it pins."""
    cat1, cat2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    small, _ = _dfs(spark, 0, 10)
    big = spark.range(0, 20_000).select("id", (F.col("id") * 2).alias("v")).repartition(16)
    catalog_txn(cat1, [{"name": "t", "root": ra, "df": small}])
    catalog_txn(cat2, [{"name": "t", "root": rb, "df": big}])
    s1 = os.path.getsize(os.path.join(cat1, "_catalog", "c000001.json"))
    s2 = os.path.getsize(os.path.join(cat2, "_catalog", "c000001.json"))
    assert abs(s1 - s2) < 64  # txn ids/paths differ slightly; pins do not


def test_catalog_as_of_timestamp_read(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_history,
        catalog_version_as_of,
    )

    cat = str(tmp_path / "cat")
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    a1, b1 = _dfs(spark, 0, 30)
    catalog_txn(
        cat,
        [{"name": "a", "root": ra, "df": a1}, {"name": "b", "root": rb, "df": b1}],
    )
    a2, b2 = _dfs(spark, 30, 90)
    catalog_txn(
        cat,
        [{"name": "a", "root": ra, "df": a2}, {"name": "b", "root": rb, "df": b2}],
    )
    hist = catalog_history(cat)
    t1, t2 = hist[0]["committed_at"], hist[1]["committed_at"]
    assert t1 < t2  # strictly increasing stamps
    assert catalog_version_as_of(cat, t1) == 1
    assert catalog_version_as_of(cat, t2 - 1) == 1
    assert catalog_version_as_of(cat, t2) == 2
    assert catalog_read(spark, cat, "a", as_of=t1).count() == 30
    assert catalog_read(spark, cat, "b", as_of=t2).count() == 90
    with pytest.raises(ValueError):
        catalog_version_as_of(cat, t1 - 1)
    with pytest.raises(ValueError):
        catalog_read(spark, cat, "a", catalog_version=1, as_of=t1)


def test_catalog_expire_keeps_newest_versions(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.catalog_txn import catalog_expire

    cat = str(tmp_path / "cat")
    ra = str(tmp_path / "a")
    for lo in (0, 10, 20, 30):
        a, _ = _dfs(spark, lo, lo + 10)
        catalog_txn(cat, [{"name": "a", "root": ra, "df": a}])
    out = catalog_expire(cat, keep_last=2)
    assert out["removed"] == [1, 2] and out["kept"] == [3, 4]
    assert catalog_versions(cat) == [3, 4]
    # head reads unaffected; expired catalog versions are gone
    assert catalog_read(spark, cat, "a").count() == 40
    with pytest.raises(ValueError):
        catalog_read(spark, cat, "a", catalog_version=1)
    with pytest.raises(ValueError):
        catalog_expire(cat, keep_last=0)


def test_sticky_stamp_survives_interleaved_txns_and_expire(spark, tmp_path):
    """ADVICE r6 (medium): catalog versions inherit sticky stamp keys, so
    catalog_expire can never delete the newest carrier of last_batch_id
    and reopen an exactly-once gate."""
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_expire,
        catalog_max_stamp,
    )

    cat = str(tmp_path / "cat")
    ra = str(tmp_path / "a")
    a, _ = _dfs(spark, 0, 10)
    snapshot_commit(a, ra)
    # v1 carries the stamp
    catalog_pin_tables(cat, {"a": (ra, 1)}, extra={"last_batch_id": 5})
    # >= keep_last interleaved pin-only transactions (no stamp passed)
    for _ in range(3):
        catalog_pin_tables(cat, {"a": (ra, 1)})
    assert len(catalog_versions(cat)) == 4
    out = catalog_expire(cat, keep_last=2)
    assert out["removed"] == [1, 2]
    # the gate survives: the retained head inherited the stamp
    assert catalog_max_stamp(cat, "last_batch_id", -1) == 5
    # high-water is monotone even if a replayed writer passes a stale id
    catalog_pin_tables(cat, {"a": (ra, 1)}, extra={"last_batch_id": 3})
    assert catalog_max_stamp(cat, "last_batch_id", -1) == 5
    catalog_pin_tables(cat, {"a": (ra, 1)}, extra={"last_batch_id": 9})
    assert catalog_max_stamp(cat, "last_batch_id", -1) == 9


def test_pin_base_is_consistent_with_publish_target(spark, tmp_path):
    """ADVICE r6: a winner landing between the versions listing and the
    base-state read must surface as CatalogConflictError on the retry,
    not be silently overwritten (base must be the state AT versions[-1],
    not a second latest-listing)."""
    import airflow_postgres_csv_spark.operators.catalog_txn as C

    cat = str(tmp_path / "cat")
    ra = str(tmp_path / "a")
    a1, _ = _dfs(spark, 0, 10)
    snapshot_commit(a1, ra)
    a2, _ = _dfs(spark, 10, 20)
    snapshot_commit(a2, ra)  # table a has snapshot versions 1, 2
    catalog_pin_tables(cat, {"a": (ra, 1)})  # catalog v1 pins a@1

    real_versions = C.catalog_versions
    real_publish = C._publish_catalog
    raced = {"done": False}

    def racing_versions(root):
        out = real_versions(root)
        if not raced["done"]:
            raced["done"] = True
            # the winner publishes (moving table a) AFTER the loser's
            # listing but BEFORE the loser reads its base state
            winner = dict(catalog_state(cat))
            winner["a"] = {"root": os.path.abspath(ra), "version": 2}
            real_publish(root, out, winner, "race", "")
        return out

    C.catalog_versions = racing_versions
    try:
        with pytest.raises(CatalogConflictError):
            catalog_pin_tables(cat, {"a": (ra, 2)}, retries=2)
    finally:
        C.catalog_versions = real_versions
    # the winner's pin is intact
    assert catalog_state(cat)["a"]["version"] == 2


def test_catalog_ddl_create_rename_drop_lifecycle(spark, tmp_path):
    """DDL ops are atomic catalog versions; resolution is per-version, so
    a rename replays correctly across time travel and a drop is a
    retention-protected unbind (old versions keep serving)."""
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_ddl,
        catalog_tables,
    )

    cat = str(tmp_path / "cat")
    ra = str(tmp_path / "a")
    a1, _ = _dfs(spark, 0, 10)
    snapshot_commit(a1, ra)
    catalog_ddl(cat, [{"op": "create", "name": "bronze.t", "root": ra}])
    assert catalog_read(spark, cat, "bronze.t").count() == 10
    # create of an existing name refuses
    with pytest.raises(ValueError):
        catalog_ddl(cat, [{"op": "create", "name": "bronze.t", "root": ra}])
    # create with no table versions refuses
    with pytest.raises(FileNotFoundError):
        catalog_ddl(
            cat, [{"op": "create", "name": "bronze.u", "root": str(tmp_path / "x")}]
        )
    # rename moves the pin; old name at old versions still resolves
    catalog_ddl(cat, [{"op": "rename", "name": "bronze.t", "to": "silver.t"}])
    assert catalog_read(spark, cat, "silver.t").count() == 10
    with pytest.raises(KeyError):
        catalog_read(spark, cat, "bronze.t")
    assert catalog_read(spark, cat, "bronze.t", catalog_version=1).count() == 10
    # namespace listing is per-version
    assert set(catalog_tables(cat, "bronze")) == set()
    assert set(catalog_tables(cat, "silver")) == {"silver.t"}
    assert set(catalog_tables(cat, "bronze", catalog_version=1)) == {"bronze.t"}
    assert set(catalog_tables(cat, "silver_t")) == set()  # prefix, not substring
    # rename of a missing name / onto an occupied name refuses
    with pytest.raises(KeyError):
        catalog_ddl(cat, [{"op": "rename", "name": "bronze.t", "to": "x"}])
    catalog_ddl(cat, [{"op": "create", "name": "bronze.t2", "root": ra}])
    with pytest.raises(ValueError):
        catalog_ddl(cat, [{"op": "rename", "name": "bronze.t2", "to": "silver.t"}])
    # atomic multi-op: the classic staging swap in ONE flip
    n0 = len(catalog_versions(cat))
    catalog_ddl(
        cat,
        [
            {"op": "rename", "name": "silver.t", "to": "silver.t_old"},
            {"op": "rename", "name": "bronze.t2", "to": "silver.t"},
        ],
    )
    assert len(catalog_versions(cat)) == n0 + 1
    assert catalog_read(spark, cat, "silver.t_old").count() == 10
    # drop unbinds the head only; history still resolves; data untouched
    v_before = catalog_versions(cat)[-1]
    catalog_ddl(cat, [{"op": "drop", "name": "silver.t_old"}])
    with pytest.raises(KeyError):
        catalog_read(spark, cat, "silver.t_old")
    assert catalog_read(
        spark, cat, "silver.t_old", catalog_version=v_before
    ).count() == 10
    assert snapshot_versions(ra) == [1]  # DROP never touches the table
    with pytest.raises(KeyError):
        catalog_ddl(cat, [{"op": "drop", "name": "silver.t_old"}])
    with pytest.raises(ValueError):
        catalog_ddl(cat, [{"op": "fuse", "name": "silver.t"}])


def test_catalog_ddl_conflict_grid(spark, tmp_path):
    """Concurrency: a DDL losing the version race rebases when the winner
    touched DISJOINT names, raises CatalogConflictError when the winner
    touched one of the SAME names (including the rename TARGET)."""
    import airflow_postgres_csv_spark.operators.catalog_txn as C
    from airflow_postgres_csv_spark.operators.catalog_txn import catalog_ddl

    cat = str(tmp_path / "cat")
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    a1, b1 = _dfs(spark, 0, 10)
    snapshot_commit(a1, ra)
    snapshot_commit(b1, rb)
    catalog_ddl(cat, [{"op": "create", "name": "t.a", "root": ra}])
    catalog_ddl(cat, [{"op": "create", "name": "t.b", "root": rb}])

    real_publish = C._publish_catalog

    def race_once(winner_tables):
        raced = {"done": False}

        def racing(root, versions, tables, txn_id, note, extra=None):
            if not raced["done"]:
                raced["done"] = True
                real_publish(root, versions, winner_tables(), "race", "")
            return real_publish(root, versions, tables, txn_id, note, extra=extra)

        C._publish_catalog = racing

    # disjoint: winner re-pins t.b; loser renames t.a -> rebase succeeds
    race_once(lambda: dict(catalog_state(cat), **{
        "t.b": {"root": os.path.abspath(rb), "version": 1}}))
    try:
        m = catalog_ddl(
            cat, [{"op": "rename", "name": "t.a", "to": "t.a2"}], retries=2
        )
    finally:
        C._publish_catalog = real_publish
    assert "t.a2" in m["tables"] and "t.a" not in m["tables"]

    # same name: winner creates the loser's rename TARGET -> conflict
    race_once(lambda: dict(catalog_state(cat), **{
        "t.a3": {"root": os.path.abspath(ra), "version": 1}}))
    try:
        with pytest.raises(CatalogConflictError):
            catalog_ddl(
                cat, [{"op": "rename", "name": "t.a2", "to": "t.a3"}], retries=2
            )
    finally:
        C._publish_catalog = real_publish
    # the winner's binding survived intact
    assert catalog_state(cat)["t.a3"]["version"] == 1
    # no retries: the loser surfaces the raw conflict
    from airflow_postgres_csv_spark.operators.snapshots import (
        SnapshotConflictError,
    )

    race_once(lambda: dict(catalog_state(cat)))
    try:
        with pytest.raises(SnapshotConflictError):
            catalog_ddl(cat, [{"op": "drop", "name": "t.b"}])
    finally:
        C._publish_catalog = real_publish


def test_catalog_txn_with_ddl_rider_write_and_promote(spark, tmp_path):
    """Blue/green promote in ONE atomic version: a catalog_txn writes the
    staged table's new version and its ddl rider renames live->archive
    and staged->live in the same flip — readers see either the whole
    promotion or none of it."""
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_ddl,
        catalog_tables,
    )

    cat = str(tmp_path / "cat")
    live_root = str(tmp_path / "live")
    staged_root = str(tmp_path / "staged")
    a1, _ = _dfs(spark, 0, 20)
    snapshot_commit(a1, live_root)
    snapshot_commit(a1, staged_root)
    catalog_ddl(cat, [{"op": "create", "name": "live.t", "root": live_root}])
    catalog_ddl(cat, [{"op": "create", "name": "staged.t", "root": staged_root}])
    v0 = catalog_versions(cat)[-1]
    # one transaction: append to the staged table AND promote it
    a2, _ = _dfs(spark, 20, 50)
    m = catalog_txn(
        cat,
        [{"name": "staged.t", "root": staged_root, "df": a2}],
        expect_pinned=True,
        ddl=[
            {"op": "rename", "name": "live.t", "to": "archive.t"},
            {"op": "rename", "name": "staged.t", "to": "live.t"},
        ],
    )
    assert len(catalog_versions(cat)) == v0 + 1  # ONE flip for all of it
    assert set(m["tables"]) == {"archive.t", "live.t"}
    assert catalog_read(spark, cat, "live.t").count() == 50
    assert catalog_read(spark, cat, "archive.t").count() == 20
    # the pre-promotion world is intact at v0
    assert set(catalog_tables(cat, catalog_version=v0)) == {"live.t", "staged.t"}
    assert catalog_read(spark, cat, "live.t", catalog_version=v0).count() == 20


def _branch_setup(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_branch,
    )

    cat = str(tmp_path / "cat")
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    a1, b1 = _dfs(spark, 0, 100)
    catalog_txn(
        cat,
        [{"name": "a", "root": ra, "df": a1.coalesce(1)},
         {"name": "b", "root": rb, "df": b1.coalesce(1)}],
    )
    broot = catalog_branch(cat, "exp")
    return cat, ra, rb, broot


def test_catalog_branch_stage_audit_publish_atomic(spark, tmp_path):
    """VERDICT r9 item 5: a catalog branch forks the WHOLE catalog,
    stages a multi-table experiment (lazy per-table branches + audits),
    and publishes as ONE atomic flip — main readers observe both tables
    at their old pins right up to the flip, then both at the new ones;
    the branch and its table branches are consumed."""
    from airflow_postgres_csv_spark.operators import branches as B
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_branch_write,
        catalog_branches,
        catalog_publish_branch,
    )

    cat, ra, rb, broot = _branch_setup(spark, tmp_path)
    assert catalog_branches(cat) == {
        "exp": {"base": 1, "head": 1, "root": broot}
    }
    # branch view == fork point
    assert catalog_read(spark, broot, "a").count() == 100
    a2, b2 = _dfs(spark, 100, 150)
    catalog_branch_write(
        spark, cat, "exp",
        [{"name": "a", "df": a2.coalesce(1)},
         {"name": "b", "df": b2.coalesce(1)}],
        audits={"a": {"grew": "count(*) = 150"}},
        cross_audits={"same_n": lambda s: s["a"].count() == s["b"].count()},
    )
    # branch sees both staged; MAIN and the real roots see nothing
    assert catalog_read(spark, broot, "a").count() == 150
    assert catalog_read(spark, broot, "b").count() == 150
    assert catalog_read(spark, cat, "a").count() == 100
    assert catalog_read(spark, cat, "b").count() == 100
    assert snapshot_versions(ra) == [1] and snapshot_versions(rb) == [1]
    m = catalog_publish_branch(cat, "exp")
    st = catalog_state(cat)
    assert st["a"]["version"] == 2 and st["b"]["version"] == 2
    assert st["a"]["root"] == ra  # pins point at the REAL roots again
    assert catalog_read(spark, cat, "a").count() == 150
    assert catalog_read(spark, cat, "b").count() == 150
    # all-or-nothing: the previous catalog version still shows both old
    assert catalog_read(spark, cat, "a", catalog_version=m["version"] - 1).count() == 100
    assert catalog_branches(cat) == {}
    assert B.snapshot_branches(ra) == {} and B.snapshot_branches(rb) == {}


def test_catalog_branch_snapshot_isolation_and_conflict(spark, tmp_path):
    """Main's concurrent move of an UNTOUCHED table carries forward
    under the branch publish (snapshot isolation); a move of a TOUCHED
    table conflicts — nothing flips, the branch is retained, and
    dropping it cleans the per-table branches."""
    from airflow_postgres_csv_spark.operators import branches as B
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_branch_write,
        catalog_branches,
        catalog_drop_branch,
        catalog_publish_branch,
    )

    cat, ra, rb, broot = _branch_setup(spark, tmp_path)
    a2, _ = _dfs(spark, 100, 150)
    catalog_branch_write(
        spark, cat, "exp", [{"name": "a", "df": a2.coalesce(1)}]
    )
    # concurrent main txn moves b (untouched by the branch)
    _, b3 = _dfs(spark, 500, 600)
    catalog_txn(cat, [{"name": "b", "root": rb, "df": b3.coalesce(1)}])
    catalog_publish_branch(cat, "exp")
    st = catalog_state(cat)
    assert catalog_read(spark, cat, "a").count() == 150   # branch landed
    assert catalog_read(spark, cat, "b").count() == 200   # main's move kept
    # now a conflicting case: branch touches a, main moves a post-fork
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_branch,
    )

    catalog_branch(cat, "exp2")
    a4, _ = _dfs(spark, 1000, 1010)
    catalog_branch_write(
        spark, cat, "exp2", [{"name": "a", "df": a4.coalesce(1)}]
    )
    a5, _ = _dfs(spark, 2000, 2010)
    catalog_txn(cat, [{"name": "a", "root": ra, "df": a5.coalesce(1)}])
    before = catalog_state(cat)
    with pytest.raises(CatalogConflictError, match="moved on main"):
        catalog_publish_branch(cat, "exp2")
    assert catalog_state(cat) == before          # nothing flipped
    assert "exp2" in catalog_branches(cat)       # retained for rebase
    assert "catb-exp2" in B.snapshot_branches(ra)
    catalog_drop_branch(cat, "exp2")
    assert catalog_branches(cat) == {}
    assert B.snapshot_branches(ra) == {}


def test_catalog_branch_audit_failure_keeps_branch_view(spark, tmp_path):
    """A failed audit leaves the BRANCH catalog at its last good pins
    and rolls the table branch back to its pre-write state — the
    rejected rows stay time-travelable on the branch for triage but
    never pollute later branch writes."""
    from airflow_postgres_csv_spark.operators.branches import AuditError
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_branch_write,
        catalog_publish_branch,
    )
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_read

    cat, ra, rb, broot = _branch_setup(spark, tmp_path)
    bad, _ = _dfs(spark, 100, 101)
    with pytest.raises(AuditError):
        catalog_branch_write(
            spark, cat, "exp", [{"name": "a", "df": bad.coalesce(1)}],
            audits={"a": {"big_batch": "count(*) >= 150"}},
        )
    # branch view unpolluted
    assert catalog_read(spark, broot, "a").count() == 100
    good, _ = _dfs(spark, 100, 160)
    catalog_branch_write(
        spark, cat, "exp", [{"name": "a", "df": good.coalesce(1)}],
        audits={"a": {"big_batch": "count(*) >= 150"}},
    )
    # the rejected row is NOT in the branch state (rolled back), only in
    # the branch's time-travel history for triage
    assert catalog_read(spark, broot, "a").count() == 160
    tbroot = catalog_state(broot)["a"]["root"]
    assert snapshot_read(spark, tbroot, version=2).count() == 101  # triage
    catalog_publish_branch(cat, "exp")
    assert catalog_read(spark, cat, "a").count() == 160


def test_catalog_branch_leftovers_never_reused_stale(spark, tmp_path):
    """A leftover catb-<name> table branch from a PRIOR same-named
    catalog branch (or an audit-failed attempt) must not poison a new
    catalog branch: drop cleans even unpinned forks, and a new branch
    re-forks from ITS OWN pin when the leftover's fork point is stale."""
    from airflow_postgres_csv_spark.operators import branches as B
    from airflow_postgres_csv_spark.operators.branches import AuditError
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_branch,
        catalog_branch_write,
        catalog_drop_branch,
        catalog_publish_branch,
        catalog_read,
    )

    cat, ra, rb, broot = _branch_setup(spark, tmp_path)
    bad, _ = _dfs(spark, 100, 101)
    with pytest.raises(AuditError):
        catalog_branch_write(
            spark, cat, "exp", [{"name": "a", "df": bad.coalesce(1)}],
            audits={"a": {"big": "count(*) >= 1000"}},
        )
    # the failed attempt forked catb-exp without advancing the pins;
    # drop must clean it anyway
    assert "catb-exp" in B.snapshot_branches(ra)
    catalog_drop_branch(cat, "exp")
    assert B.snapshot_branches(ra) == {}

    # stale-leftover case: fork catb-exp2 by hand at v1, then move main
    # and open a NEW catalog branch of the same name — its write must
    # re-fork from the CURRENT pin, not reuse the v1 fork
    B.snapshot_branch(ra, "catb-exp2")
    a2, _ = _dfs(spark, 100, 150)
    catalog_txn(cat, [{"name": "a", "root": ra, "df": a2.coalesce(1)}])
    catalog_branch(cat, "exp2")
    a3, _ = _dfs(spark, 200, 210)
    catalog_branch_write(
        spark, cat, "exp2", [{"name": "a", "df": a3.coalesce(1)}]
    )
    bview = catalog_state(os.path.join(cat, "_catbranches", "exp2"))
    assert bview["a"]["base_version"] == 2  # forked from the CURRENT pin
    catalog_publish_branch(cat, "exp2")
    assert catalog_read(spark, cat, "a").count() == 160  # 100+50+10


def test_catalog_vacuum_sweeps_all_tables(spark, tmp_path):
    """catalog_vacuum: one call vacuums every pinned table (orphans
    collected, all versions kept, older catalog pins still readable)
    and reports — never drops — catalog branches older than the
    window."""
    import time

    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_branch,
        catalog_branches,
        catalog_vacuum,
    )

    cat = str(tmp_path / "cat")
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    a1, b1 = _dfs(spark, 0, 50)
    catalog_txn(
        cat,
        [{"name": "a", "root": ra, "df": a1.coalesce(1)},
         {"name": "b", "root": rb, "df": b1.coalesce(1)}],
    )
    a2, _ = _dfs(spark, 50, 80)
    catalog_txn(cat, [{"name": "a", "root": ra, "df": a2.coalesce(1)}])
    # crash-staged orphans in both tables, aged past the window
    old = time.time_ns() - 10 * 86400 * 10**9
    for root in (ra, rb):
        d = os.path.join(root, "data", "deadbeef0001")
        os.makedirs(d)
        p = os.path.join(d, "part-crashed.parquet")
        with open(p, "wb") as f:
            f.write(b"PAR1crashPAR1")
        os.utime(p, ns=(old, old))
    catalog_branch(cat, "exp")
    out = catalog_vacuum(cat, dry_run=True)
    assert out["removed_files"] == 0 and len(out["tables"]) == 2
    assert sum(len(t["candidates"]) for t in out["tables"].values()) == 2
    out = catalog_vacuum(cat)
    assert out["removed_files"] == 2 and out["removed_bytes"] > 0
    assert out["stale_branches"] == []  # the fresh branch is in-window
    # every catalog pin still reads (vacuum keeps all table versions)
    assert catalog_read(spark, cat, "a").count() == 80
    assert catalog_read(spark, cat, "a", catalog_version=1).count() == 50
    # an aged branch is REPORTED, not dropped
    broot = catalog_branches(cat)["exp"]["root"]
    bhead = os.path.join(broot, "_catalog", "c000001.json")
    import json as _json

    m = _json.load(open(bhead))
    m["committed_at"] = old
    with open(bhead, "w") as f:
        _json.dump(m, f)
    out = catalog_vacuum(cat)
    assert out["stale_branches"] == ["exp"]
    assert "exp" in catalog_branches(cat)
