"""Materialized views (operators/catalog_txn.py): stored SQL + a managed
snapshot table + the source pins it was computed from, refreshed as one
atomic catalog flip. Reads serve the MATERIALIZED data (possibly stale,
never recomputed inline); staleness is a metadata comparison; the
materialized root behaves like any snapshot table (time travel through
catalog versions, vacuum)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.catalog_txn import (
    catalog_ddl,
    catalog_mviews,
    catalog_pin_tables,
    catalog_read,
    catalog_refresh_mview,
    catalog_txn,
    catalog_versions,
)
from airflow_postgres_csv_spark.operators.snapshots import snapshot_commit


def _seed(spark, tmp_path):
    cat = str(tmp_path / "cat")
    ro = str(tmp_path / "orders")
    orders = spark.range(0, 100).select(
        "id", (F.col("id") % 5).alias("bucket"),
        (F.col("id") % 7).cast("double").alias("amount"),
    )
    catalog_txn(cat, [{"name": "sales.orders", "root": ro, "df": orders}])
    catalog_ddl(
        cat,
        [{
            "op": "create_mview",
            "name": "sales.rollup",
            "sql": (
                "SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n, "
                "CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total "
                "FROM o GROUP BY bucket"
            ),
            "tables": {"o": "sales.orders"},
            "root": str(tmp_path / "mv_rollup"),
        }],
    )
    return cat, ro


def test_mview_refresh_read_staleness_cycle(spark, tmp_path):
    cat, ro = _seed(spark, tmp_path)
    # unrefreshed: read refuses, listing says stale
    assert catalog_mviews(cat)["sales.rollup"]["stale"] is True
    with pytest.raises(RuntimeError, match="never been refreshed"):
        catalog_read(spark, cat, "sales.rollup")
    r1 = catalog_refresh_mview(spark, cat, "sales.rollup")
    assert r1["refreshed"] is True
    got = {
        r["bucket"]: (r["n"], r["total"])
        for r in catalog_read(spark, cat, "sales.rollup").collect()
    }
    assert got[0] == (20, sum(float(i % 7) for i in range(0, 100, 5)))
    assert catalog_mviews(cat)["sales.rollup"]["stale"] is False
    # refresh is idempotent while sources stand still
    assert catalog_refresh_mview(spark, cat, "sales.rollup")["refreshed"] is False

    # source moves -> stale, but reads still serve the MATERIALIZED state
    snapshot_commit(
        spark.range(100, 200).select(
            "id",
            F.lit(0).cast("long").alias("bucket"),
            F.lit(1.0).alias("amount"),
        ),
        ro,
    )
    catalog_pin_tables(cat, {"sales.orders": (ro, 2)})
    assert catalog_mviews(cat)["sales.rollup"]["stale"] is True
    still = {
        r["bucket"]: r["n"]
        for r in catalog_read(spark, cat, "sales.rollup").collect()
    }
    assert still[0] == 20  # stale-by-design, not silently recomputed
    pre_refresh_v = catalog_versions(cat)[-1]

    r2 = catalog_refresh_mview(spark, cat, "sales.rollup")
    assert r2["refreshed"] is True
    now = {
        r["bucket"]: r["n"]
        for r in catalog_read(spark, cat, "sales.rollup").collect()
    }
    assert now[0] == 120
    # catalog time travel replays the era's MATERIALIZED state
    old = {
        r["bucket"]: r["n"]
        for r in catalog_read(
            spark, cat, "sales.rollup", catalog_version=pre_refresh_v
        ).collect()
    }
    assert old[0] == 20


def test_mview_guards(spark, tmp_path):
    cat, ro = _seed(spark, tmp_path)
    catalog_refresh_mview(spark, cat, "sales.rollup")
    # the source table is protected while the mview references it
    with pytest.raises(ValueError, match="reference it"):
        catalog_ddl(cat, [{"op": "drop", "name": "sales.orders"}])
    with pytest.raises(ValueError, match="materialized view"):
        catalog_ddl(cat, [{"op": "drop", "name": "sales.rollup"}])
    with pytest.raises(ValueError, match="view-on-view"):
        catalog_ddl(
            cat,
            [{
                "op": "create_view", "name": "sales.v",
                "sql": "SELECT * FROM m", "tables": {"m": "sales.rollup"},
            }],
        )
    with pytest.raises(ValueError, match="a table pin cannot replace"):
        catalog_pin_tables(cat, {"sales.rollup": (ro, 1)})
    # a plain view and an mview share the namespace
    with pytest.raises(ValueError, match="already exists"):
        catalog_ddl(
            cat,
            [{
                "op": "create_mview", "name": "sales.orders",
                "sql": "SELECT 1 AS one", "tables": {"o": "sales.orders"},
                "root": str(tmp_path / "x"),
            }],
        )
    catalog_ddl(cat, [{"op": "drop_mview", "name": "sales.rollup"}])
    catalog_ddl(cat, [{"op": "drop", "name": "sales.orders"}])


def test_mview_staged_on_branch_publishes_atomically(spark, tmp_path):
    """Mviews on catalog branches: a refresh staged ON the branch
    publishes in the SAME atomic flip as the table pins (all-or-nothing
    visibility of table write + consistent mview), the staleness
    re-check refuses publishing a refresh that predates a later branch
    write, and a drop staged on the branch publishes too."""
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        CatalogConflictError,
        catalog_branch,
        catalog_branch_write,
        catalog_publish_branch,
    )

    cat, ro = _seed(spark, tmp_path)
    catalog_refresh_mview(spark, cat, "sales.rollup")
    pre_rollup = {
        r.bucket: (r.n, r.total)
        for r in catalog_read(spark, cat, "sales.rollup").collect()
    }
    broot = catalog_branch(cat, "exp")

    def more(lo, hi):
        return spark.range(lo, hi).select(
            "id", (F.col("id") % 5).alias("bucket"),
            (F.col("id") % 7).cast("double").alias("amount"),
        ).coalesce(1)

    catalog_branch_write(
        spark, cat, "exp", [{"name": "sales.orders", "df": more(100, 160)}]
    )
    catalog_refresh_mview(spark, broot, "sales.rollup")
    # a LATER branch write makes the staged refresh stale: refuse
    catalog_branch_write(
        spark, cat, "exp", [{"name": "sales.orders", "df": more(160, 200)}]
    )
    with pytest.raises(CatalogConflictError, match="STALE"):
        catalog_publish_branch(cat, "exp")
    # re-refresh at the branch head -> publishable, one atomic flip
    catalog_refresh_mview(spark, broot, "sales.rollup")
    pre_versions = catalog_versions(cat)
    catalog_publish_branch(cat, "exp")
    post_versions = catalog_versions(cat)
    assert len(post_versions) == len(pre_versions) + 1  # ONE catalog flip
    got = {
        r.bucket: (r.n, r.total)
        for r in catalog_read(spark, cat, "sales.rollup").collect()
    }
    want = {
        r.bucket: (r.n, r.total)
        for r in catalog_read(spark, cat, "sales.orders")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("amount").cast("decimal(18,2)"))
            .cast("double").alias("total"),
        )
        .collect()
    }
    assert got == want and got != pre_rollup
    # mview entry pins translated to MAIN coordinates (no branch roots)
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_mviews,
    )

    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_state,
    )

    mv = catalog_mviews(cat)["sales.rollup"]
    assert mv["stale"] is False
    # pins were translated from branch-table coordinates to the exact
    # main pins the flip published
    head = catalog_state(cat)
    assert mv["pins"]["sales.orders"] == [
        head["sales.orders"]["root"], head["sales.orders"]["version"]
    ]
    # time travel: the pre-publish catalog version serves the OLD world
    old = {
        r.bucket: (r.n, r.total)
        for r in catalog_read(
            spark, cat, "sales.rollup", catalog_version=pre_versions[-1]
        ).collect()
    }
    assert old == pre_rollup
    # a drop staged on a fresh branch publishes atomically too
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_branches,
    )

    catalog_branch(cat, "exp2")
    b2 = catalog_branches(cat)["exp2"]["root"]
    catalog_ddl(b2, [{"op": "drop_mview", "name": "sales.rollup"}])
    catalog_publish_branch(cat, "exp2")
    assert "sales.rollup" not in catalog_mviews(cat)


def test_mview_branch_publish_conflicts_when_main_refreshed(
    spark, tmp_path
):
    """First-committer-wins per mview name: a branch that staged a
    refresh conflicts if main refreshed (moved) the same mview since
    the fork."""
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        CatalogConflictError,
        catalog_branch,
        catalog_branch_write,
        catalog_drop_branch,
        catalog_publish_branch,
    )

    cat, ro = _seed(spark, tmp_path)
    catalog_refresh_mview(spark, cat, "sales.rollup")
    broot = catalog_branch(cat, "exp")
    catalog_branch_write(
        spark, cat, "exp",
        [{
            "name": "sales.orders",
            "df": spark.range(100, 120).select(
                "id", (F.col("id") % 5).alias("bucket"),
                (F.col("id") % 7).cast("double").alias("amount"),
            ).coalesce(1),
        }],
    )
    catalog_refresh_mview(spark, broot, "sales.rollup")
    # main moves the SAME mview (out-of-band source write + refresh)
    snapshot_commit(
        spark.range(500, 510).select(
            "id", (F.col("id") % 5).alias("bucket"),
            (F.col("id") % 7).cast("double").alias("amount"),
        ).coalesce(1),
        ro,
    )
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_pin_tables,
    )
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_versions as _svs,
    )

    catalog_pin_tables(cat, {"sales.orders": (ro, _svs(ro)[-1])})
    catalog_refresh_mview(spark, cat, "sales.rollup")
    with pytest.raises(CatalogConflictError):
        catalog_publish_branch(cat, "exp")
    catalog_drop_branch(cat, "exp")


def test_mview_vacuum_sweeps_materialized_root(spark, tmp_path):
    import os

    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_vacuum,
    )

    cat, ro = _seed(spark, tmp_path)
    catalog_refresh_mview(spark, cat, "sales.rollup")
    mroot = catalog_mviews(cat)["sales.rollup"]["root"]
    # crash-staged orphan inside the MATERIALIZED root
    d = os.path.join(mroot, "data", "orphan0001")
    os.makedirs(d)
    p = os.path.join(d, "part-crashed.parquet")
    with open(p, "wb") as f:
        f.write(b"PAR1xPAR1")
    import time as _time

    out = catalog_vacuum(cat, older_than_ns=_time.time_ns() + 10**9)
    assert out["removed_files"] >= 1
    assert not os.path.exists(p)
    # and the materialized data still reads back
    assert catalog_read(spark, cat, "sales.rollup").count() == 5


def test_incremental_mview_ivm_refresh(spark, tmp_path):
    """An incremental mview refreshes via change-feed IVM — O(changes),
    with retractions — and reads hide the n=0 groups; the catalog pin
    bounds each refresh exactly at the pinned source version."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_delete_mor,
    )

    cat = str(tmp_path / "cat")
    ro = str(tmp_path / "src")
    rows = spark.range(0, 60).select(
        "id", (F.col("id") % 4).alias("g"), (F.col("id") * 3).alias("amt")
    )
    catalog_txn(cat, [{"name": "t", "root": ro, "df": rows.coalesce(1)}])
    catalog_ddl(
        cat,
        [{
            "op": "create_mview", "name": "t_rollup",
            "tables": {"s": "t"}, "root": str(tmp_path / "mv"),
            "incremental": {"group_col": "g", "amount_col": "amt"},
        }],
    )
    assert catalog_refresh_mview(spark, cat, "t_rollup")["refreshed"]
    got = {r.g: (r.n, r.total)
           for r in catalog_read(spark, cat, "t_rollup").collect()}
    assert got[0] == (15, sum(i * 3 for i in range(0, 60, 4)))
    # idempotent while the pin stands still
    assert not catalog_refresh_mview(spark, cat, "t_rollup")["refreshed"]

    # retraction: erase group 2's rows, pin, refresh — the group VANISHES
    snapshot_delete_mor(spark, ro, condition="g = 2", key_col="g")
    catalog_pin_tables(cat, {"t": (ro, 2)})
    assert catalog_refresh_mview(spark, cat, "t_rollup")["refreshed"]
    after = {r.g: r.n for r in catalog_read(spark, cat, "t_rollup").collect()}
    assert 2 not in after and after[0] == 15

    # out-of-band commit BEYOND the pin is not folded until it is pinned
    snapshot_commit(
        spark.range(60, 80).select(
            "id", F.lit(0).cast("long").alias("g"),
            (F.col("id") * 3).alias("amt"),
        ).coalesce(1),
        ro,
    )
    assert not catalog_refresh_mview(spark, cat, "t_rollup")["refreshed"]
    assert {r.g: r.n for r in catalog_read(spark, cat, "t_rollup").collect()}[0] == 15
    catalog_pin_tables(cat, {"t": (ro, 3)})
    catalog_refresh_mview(spark, cat, "t_rollup")
    assert {r.g: r.n for r in catalog_read(spark, cat, "t_rollup").collect()}[0] == 35


def test_incremental_mview_validation(spark, tmp_path):
    cat = str(tmp_path / "cat")
    ro = str(tmp_path / "src")
    catalog_txn(
        cat,
        [{"name": "t", "root": ro,
          "df": spark.range(3).select("id", F.lit(1).alias("g"))}],
    )
    with pytest.raises(ValueError, match="exactly"):
        catalog_ddl(
            cat,
            [{"op": "create_mview", "name": "m", "tables": {"s": "t"},
              "root": str(tmp_path / "m"), "incremental": {"group_col": "g"}}],
        )
    with pytest.raises(ValueError, match="one source table"):
        catalog_ddl(
            cat,
            [{"op": "create_mview", "name": "m",
              "tables": {"s": "t", "u": "t"}, "root": str(tmp_path / "m"),
              "incremental": {"group_col": "g", "amount_col": "id"}}],
        )


def test_refresh_retry_never_regresses_a_concurrent_refresh(
    spark, tmp_path, monkeypatch
):
    """A losing refresh that retries must CONFLICT when another refresh
    landed meanwhile — republishing its older materialization would
    regress the catalog entry to staler pins."""
    from airflow_postgres_csv_spark.operators import catalog_txn as C

    cat = str(tmp_path / "cat")
    ro = str(tmp_path / "src")
    catalog_txn(
        cat,
        [{"name": "t", "root": ro,
          "df": spark.range(10).select("id", (F.col("id") % 2).alias("g"))}],
    )
    catalog_ddl(
        cat,
        [{"op": "create_mview", "name": "m", "sql":
          "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s",
          "tables": {"s": "t"}, "root": str(tmp_path / "m")}],
    )
    catalog_refresh_mview(spark, cat, "m")
    # sources move twice; refresh A computes from pin v2 but a concurrent
    # refresh B lands (from pin v3) before A's catalog flip
    snapshot_commit(
        spark.range(10, 30).select("id", (F.col("id") % 2).alias("g")), ro
    )
    catalog_pin_tables(cat, {"t": (ro, 2)})
    real = C._publish_catalog
    state = {"fired": False}

    def racing(croot, versions, tables, txn_id, note, extra=None):
        if not state["fired"] and note.startswith("refresh mview"):
            state["fired"] = True
            # concurrent refresh B from even NEWER pins lands first
            snapshot_commit(
                spark.range(30, 40).select(
                    "id", (F.col("id") % 2).alias("g")
                ),
                ro,
            )
            monkeypatch.undo()
            catalog_pin_tables(cat, {"t": (ro, 3)})
            catalog_refresh_mview(spark, cat, "m")
            monkeypatch.setattr(C, "_publish_catalog", racing)
            from airflow_postgres_csv_spark.operators.snapshots import (
                SnapshotConflictError,
            )

            raise SnapshotConflictError("lost the catalog race (injected)")
        return real(croot, versions, tables, txn_id, note, extra=extra)

    monkeypatch.setattr(C, "_publish_catalog", racing)
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        CatalogConflictError,
    )

    with pytest.raises(CatalogConflictError, match="refreshed concurrently"):
        catalog_refresh_mview(spark, cat, "m", retries=1)
    monkeypatch.undo()
    # the catalog still serves B's fresher materialization
    assert catalog_read(spark, cat, "m").collect()[0]["n"] == 40


def test_incremental_mview_out_of_band_dst_advance(spark, tmp_path):
    """The refresh must pin the dst version whose ivm_applied_version
    STAMP equals the pinned source version — when the rollup table was
    advanced out-of-band (direct snapshot_incremental_agg sharing the
    dst), blindly pinning the dst head would serve content AHEAD of the
    recorded source pins. If no retained materialization matches the
    pin, the refresh refuses loudly instead of publishing a lie."""
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        CatalogConflictError,
    )
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_incremental_agg,
        snapshot_versions,
    )

    cat = str(tmp_path / "cat")
    ro = str(tmp_path / "src")
    mv_root = str(tmp_path / "mv")
    rows = spark.range(0, 40).select(
        "id", (F.col("id") % 4).alias("g"), (F.col("id") * 3).alias("amt")
    )
    catalog_txn(cat, [{"name": "t", "root": ro, "df": rows.coalesce(1)}])
    catalog_ddl(
        cat,
        [{
            "op": "create_mview", "name": "t_rollup",
            "tables": {"s": "t"}, "root": mv_root,
            "incremental": {"group_col": "g", "amount_col": "amt"},
        }],
    )
    assert catalog_refresh_mview(spark, cat, "t_rollup")["refreshed"]

    # src advances to v2; an OUT-OF-BAND direct IVM run applies it to the
    # dst before any catalog pin moves
    snapshot_commit(
        spark.range(40, 60).select(
            "id", F.lit(1).cast("long").alias("g"),
            (F.col("id") * 3).alias("amt"),
        ).coalesce(1),
        ro,
    )
    snapshot_incremental_agg(spark, ro, mv_root, "g", "amt")
    stamped_v2 = snapshot_versions(mv_root)[-1]
    # pin the source to v2: the agg no-ops (already applied) but the entry
    # must pin the STAMPED materialization, keeping pins<->content honest
    catalog_pin_tables(cat, {"t": (ro, 2)})
    res = catalog_refresh_mview(spark, cat, "t_rollup")
    assert res["refreshed"] and res["version"] == stamped_v2
    got = {r.g: r.n for r in catalog_read(spark, cat, "t_rollup").collect()}
    assert got[1] == 10 + 20  # v2 content: group 1 grew by the new rows

    # src advances v3 AND v4; one out-of-band IVM folds both (stamp jumps
    # 2 -> 4, no commit stamped 3) — pinning the source at v3 has no
    # matching materialization: refuse, never publish inconsistent pins
    for lo, hi in ((60, 70), (70, 80)):
        snapshot_commit(
            spark.range(lo, hi).select(
                "id", F.lit(2).cast("long").alias("g"),
                (F.col("id") * 3).alias("amt"),
            ).coalesce(1),
            ro,
        )
    snapshot_incremental_agg(spark, ro, mv_root, "g", "amt")
    catalog_pin_tables(cat, {"t": (ro, 3)})
    with pytest.raises(CatalogConflictError, match="out-of-band"):
        catalog_refresh_mview(spark, cat, "t_rollup")
