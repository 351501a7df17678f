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

def test_maintenance_plan_root_only_no_stat_calls(spark, tmp_path, monkeypatch):
    """VERDICT r8 item 2: at the DEFAULT threshold the advisor must be
    root-manifest-only — zero per-file stat calls AND zero sidecar opens
    (the per-commit (n_files, total_bytes, n_small) rollup plus the
    sketch_commits membership answer everything). A non-default
    threshold may open sidecars (O(commits) JSON reads for the recount)
    but still never stats a file."""
    from airflow_postgres_csv_spark.operators import maintenance as M
    from airflow_postgres_csv_spark.operators import snapshots as S

    root = str(tmp_path / "t")
    for k in range(4):
        snapshot_commit(
            _batch(spark, k * 200, (k + 1) * 200).coalesce(1), root,
            sketch_cols=["x"] if k == 2 else None,
        )
    snapshot_delete_mor(spark, root, condition="id = 7", key_col="id")
    snapshot_optimize_incremental(
        spark, root, zorder_by=("x", "y"), target_bytes=1 << 30
    )
    # reference reading BEFORE arming the spies (default threshold)
    want = snapshot_maintenance_plan(root)
    S._metadata_cache_clear()

    def bomb(path):
        raise AssertionError(f"os.path.getsize({path}) on the advisor path")

    monkeypatch.setattr(M.os.path, "getsize", bomb)
    real_sidecar = S._load_sidecar
    opens = {"n": 0}

    def counting_sidecar(root_, manifest, cid):
        opens["n"] += 1
        return real_sidecar(root_, manifest, cid)

    monkeypatch.setattr(M, "_load_sidecar", counting_sidecar)
    got = snapshot_maintenance_plan(root)
    assert got == want
    assert opens["n"] == 0, f"{opens['n']} sidecar opens at default threshold"
    # non-default threshold: sidecar byte maps recount n_small — bounded
    # by commit count, still zero getsize calls
    got2 = snapshot_maintenance_plan(root, target_bytes=1 << 20)
    assert got2["metrics"]["n_files"] == got["metrics"]["n_files"]
    assert opens["n"] <= got["metrics"]["n_commits"]


def test_table_stats_describe_detail(spark, tmp_path, monkeypatch):
    """snapshot_table_stats = DESCRIBE DETAIL from the root alone: file/
    byte/commit counts, clustered fraction, sketch coverage, tombstone
    and retention debt — and zero sidecar opens / stat calls on a
    fully-rolled-up table."""
    import os

    from airflow_postgres_csv_spark.operators import maintenance as M
    from airflow_postgres_csv_spark.operators import snapshots as S
    from airflow_postgres_csv_spark.operators.maintenance import (
        snapshot_table_stats,
    )

    root = str(tmp_path / "t")
    for k in range(3):
        snapshot_commit(
            _batch(spark, k * 200, (k + 1) * 200).coalesce(1), root,
            sketch_cols=["x"] if k == 0 else None,
        )
    st = snapshot_table_stats(root)
    assert st["n_commits"] == st["n_files"] == 3
    assert st["sketch_coverage"] == 1.0 and st["clustered_fraction"] is None
    assert st["n_tombstones"] == 0 and st["partial_commits"] == 0
    assert st["schema_cols"] == 3
    sizes = [
        os.path.getsize(os.path.join(root, rel))
        for rel in S._load_manifest(root, 3)["files"]
    ]
    assert st["total_bytes"] == sum(sizes) and st["small_files"] == 3

    snapshot_optimize_incremental(
        spark, root, zorder_by=("x", "y"), target_bytes=1 << 30
    )
    snapshot_delete_mor(spark, root, condition="id = 3", key_col="id")
    st = snapshot_table_stats(root)
    assert st["clustered_fraction"] == 1.0 and st["n_tombstones"] == 1
    assert st["version"] == 5 and st["retained_versions"] == 5
    # version pin reads history
    st1 = snapshot_table_stats(root, version=1)
    assert st1["n_commits"] == 1 and st1["n_tombstones"] == 0
    # metadata-only: no stats, no sidecar opens
    S._metadata_cache_clear()
    monkeypatch.setattr(
        M.os.path, "getsize",
        lambda p: (_ for _ in ()).throw(AssertionError(f"getsize({p})")),
    )
    monkeypatch.setattr(
        M, "_load_sidecar",
        lambda *a: (_ for _ in ()).throw(AssertionError("sidecar open")),
    )
    assert snapshot_table_stats(root) == st


def test_table_stats_partition_visibility(spark, tmp_path):
    """DESCRIBE DETAIL reports the active partition spec and the share of
    commits carrying partition values — still from the root alone."""
    import datetime as dt

    from airflow_postgres_csv_spark.operators.maintenance import (
        snapshot_table_stats,
    )

    root = str(tmp_path / "t")
    df = spark.range(0, 200).select(
        "id",
        (
            F.lit(dt.datetime(2024, 1, 1).isoformat()).cast("timestamp")
            + F.make_interval(hours=F.col("id"))
        ).alias("ts"),
    )
    snapshot_commit(df, root, partition_transforms=[("ts", "day")])
    st = snapshot_table_stats(root)
    assert st["partition_spec"] == [["ts", "day"]]
    assert st["partition_coverage"] == 1.0
    # a spec-less table reports None for both
    root2 = str(tmp_path / "plain")
    snapshot_commit(df, root2)
    st2 = snapshot_table_stats(root2)
    assert st2["partition_spec"] is None and st2["partition_coverage"] is None


def _age(path, days=10):
    import os
    import time

    old = time.time_ns() - days * 86400 * 10**9
    os.utime(path, ns=(old, old))


def test_vacuum_removes_orphans_keeps_all_versions(spark, tmp_path):
    """remove_orphan_files semantics (VERDICT r9 item 3): crash-staged
    data files and leaked sidecars no manifest pins are collected once
    older than the safety window; every retained VERSION's files —
    including tombstones and non-head history — survive, as does any
    staged file inside the window (an in-flight commit)."""
    import os
    import time

    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_vacuum,
    )

    root = str(tmp_path / "t")
    snapshot_commit(_batch(spark, 0, 100).coalesce(1), root)
    snapshot_commit(_batch(spark, 100, 200).coalesce(1), root)
    snapshot_delete_mor(spark, root, "id < 10", key_col="id")

    # crash-staged commit dirs: one old (collectable), one fresh (in-flight)
    old_dir = os.path.join(root, "data", "deadbeef0001")
    new_dir = os.path.join(root, "data", "cafebabe0002")
    for d in (old_dir, new_dir):
        os.makedirs(d)
        with open(os.path.join(d, "part-crashed.parquet"), "wb") as f:
            f.write(b"PAR1crashPAR1")
    _age(os.path.join(old_dir, "part-crashed.parquet"))
    # leaked sidecar no manifest references
    leaked = os.path.join(root, "manifests", "sc-leaked.json")
    with open(leaked, "w") as f:
        f.write("{}")
    _age(leaked)

    # dry run: reports, removes nothing
    dry = snapshot_vacuum(root, dry_run=True)
    assert dry["dry_run"] and dry["removed_files"] == 0
    assert dry["candidates"] == [
        os.path.join("data", "deadbeef0001", "part-crashed.parquet"),
        os.path.join("manifests", "sc-leaked.json"),
    ]
    assert os.path.exists(old_dir) and os.path.exists(leaked)

    out = snapshot_vacuum(root)
    assert out["removed_files"] == 2 and out["candidates"] == dry["candidates"]
    assert not os.path.exists(old_dir)          # dir gone with its file
    assert not os.path.exists(leaked)
    assert os.path.exists(os.path.join(new_dir, "part-crashed.parquet"))

    # every version still reads exactly (vacuum never drops history)
    assert snapshot_read(spark, root, version=1).count() == 100
    assert snapshot_read(spark, root, version=2).count() == 200
    assert snapshot_read(spark, root).count() == 190  # MOR delete intact
    # idempotent: nothing left outside the window
    again = snapshot_vacuum(root)
    assert again["removed_files"] == 0 and again["candidates"] == []
    # a recent explicit cutoff collects the in-flight dir too
    out2 = snapshot_vacuum(root, older_than_ns=time.time_ns())
    assert out2["candidates"] == [
        os.path.join("data", "cafebabe0002", "part-crashed.parquet")
    ]


def test_vacuum_spares_branches_and_crashed_publish_retries(spark, tmp_path):
    """A crashed branch publish (_link_back done, manifest link not)
    leaves root-side hardlinks no root manifest pins. Vacuum may
    collect those NAMES — the branch keeps its own links (same inode),
    its reads stay intact, and a publish retry re-links and lands."""
    import os

    from airflow_postgres_csv_spark.operators import branches as B
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_vacuum,
    )

    root = str(tmp_path / "t")
    snapshot_commit(_batch(spark, 0, 50).coalesce(1), root)
    broot = B.snapshot_branch(root, "feed")
    snapshot_commit(_batch(spark, 50, 80).coalesce(1), broot)

    # simulate the crash: hardlink the branch's new files into the root
    # (what a publish does first), then die before the manifest link
    base_m = _load_manifest(root, 1)
    bm = _load_manifest(broot, 2)
    added = [f for f in bm["files"] if f not in base_m["files"]]
    B._link_back(root, broot, bm, added)
    for rel in added:
        _age(os.path.join(root, rel))
        _age(os.path.dirname(os.path.join(root, rel)))

    out = snapshot_vacuum(root)
    assert sorted(out["candidates"]) == sorted(added)
    for rel in added:  # root-side names gone...
        assert not os.path.exists(os.path.join(root, rel))
    # ...but the branch's own links survive and read exactly
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_read

    assert snapshot_read(spark, broot).count() == 80
    # and the retry publishes cleanly (re-links the missing names)
    m = B.snapshot_publish_branch(root, "feed")
    assert m["mode"] == "publish_branch"
    assert snapshot_read(spark, root).count() == 80


def test_metadata_tables_files_and_partitions(spark, tmp_path):
    """files/partitions metadata tables: one row per pinned file with
    its commit, sidecar bytes, and hidden-partition tuple; the
    partitions view aggregates files/bytes per tuple. Registered as a
    temp view they answer raw SQL (static snapshot at registration)."""
    from airflow_postgres_csv_spark.operators.maintenance import (
        snapshot_metadata_table,
    )

    root = str(tmp_path / "t")
    snapshot_commit(
        _batch(spark, 0, 100), root,
        partition_transforms=[("y", "identity")],
    )
    snapshot_commit(
        _batch(spark, 100, 200), root,
        partition_transforms=[("y", "identity")],
    )
    files = snapshot_metadata_table(spark, root, "files")
    rows = files.collect()
    # identity partitioning: one file per y value per commit (y in 0..6)
    assert len(rows) == 14
    assert all(r.bytes and r.bytes > 0 for r in rows)
    assert all(r.partition is not None for r in rows)
    assert len({r.commit_id for r in rows}) == 2
    parts = snapshot_metadata_table(spark, root, "partitions")
    prow = {r.partition: (r.n_files, r.total_bytes) for r in parts.collect()}
    assert len(prow) == 7 and all(n == 2 for n, _ in prow.values())
    # version pin: the files table of v1 lists only the first commit
    f1 = snapshot_metadata_table(spark, root, "files", version=1)
    assert f1.count() == 7
    # SQL addressability
    parts.createOrReplaceTempView("t_partitions")
    assert spark.sql(
        "SELECT COUNT(*) n FROM t_partitions WHERE n_files = 2"
    ).first().n == 7
    with pytest.raises(ValueError, match="unknown metadata table"):
        snapshot_metadata_table(spark, root, "nope")


def test_vacuum_bounded_at_10k_commits(spark, tmp_path):
    """Scale pin for the orphan GC: at 10^4 commits, snapshot_vacuum's
    reference collection is O(commits) JSON reads (root + sidecars, no
    data I/O) and the sweep itself touches only what the data/ listing
    yields — the whole call stays within a small wall bound while still
    finding a planted aged orphan."""
    import json as _json
    import os
    import time as _time

    from airflow_postgres_csv_spark.operators import snapshots as S

    root = str(tmp_path / "many")
    seed = snapshot_commit(_batch(spark, 0, 10).coalesce(1), root)
    n = 10_000
    m1 = S._load_manifest(root, 1)
    commit_files = dict(m1["commit_files"])
    sidecars = dict(m1["sidecars"])
    commit_ranges = dict(m1["commit_ranges"])
    for i in range(n):
        cid = f"syn{i:08x}"
        rel = os.path.join("data", cid, "part-0.parquet")
        sc_rel = os.path.join("manifests", f"sc-{cid}.json")
        with open(os.path.join(root, sc_rel), "w") as f:
            _json.dump(
                {"stats": {rel: {"id": [i, i]}}, "files": [rel],
                 "bytes": {rel: 131072 + i}}, f,
            )
        commit_files[cid] = 1
        sidecars[cid] = sc_rel
        commit_ranges[cid] = {"id": [i, i]}
    manifest = {
        "version": 2, "parent": 1,
        "committed_at": m1["committed_at"] + 1,
        "mode": "append", "commit_id": "syn0000270f",
        "n_files": seed["n_files"] + n, "schema": seed["schema"],
        "commit_schemas": {}, "sidecars": sidecars,
        "commit_ranges": commit_ranges, "tombstones": [],
        "commit_files": commit_files,
    }
    with open(S._manifest_path(root, 2), "w") as f:
        _json.dump(manifest, f)
    # a crash-staged orphan aged past the window
    d = os.path.join(root, "data", "orphan000001")
    os.makedirs(d)
    p = os.path.join(d, "part-crashed.parquet")
    with open(p, "wb") as f:
        f.write(b"PAR1crashPAR1")
    old = _time.time_ns() - 10 * 86400 * 10**9
    os.utime(p, ns=(old, old))
    t0 = _time.time()
    out = S.snapshot_vacuum(root)
    wall = _time.time() - t0
    assert out["removed_files"] == 1 and out["candidates"] == [
        os.path.join("data", "orphan000001", "part-crashed.parquet")
    ]
    assert wall < 5.0, f"vacuum took {wall:.2f}s at {n} commits"
    # every pinned file survived (the seed's real file reads back)
    assert snapshot_read(spark, root, version=1).count() == 10


def test_maintenance_plan_sort_debt_axis(spark, tmp_path):
    """Advisor trigger/recovery for declared sort orders: commits that
    predate the declaration (or arrived via direct-publish rewrites) are
    unsorted debt — at the threshold the plan recommends the INCREMENTAL
    optimize (rewriting only those commits; a full compact would rewrite
    the already-sorted bulk too); the cycle restores the layout by
    pointer-inheriting every sorted commit and the plan clears."""
    import os

    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_optimize_incremental,
        snapshot_read,
        snapshot_versions,
    )

    root = str(tmp_path / "t")
    for k in range(8):  # pre-declaration commits: all unsorted debt
        snapshot_commit(_batch(spark, k * 10, (k + 1) * 10).coalesce(1), root)
    m9 = snapshot_commit(
        _batch(spark, 80, 90).coalesce(1), root, sort_order=["id"]
    )
    plan = snapshot_maintenance_plan(root)
    assert plan["metrics"]["unsorted_commits"] == 8
    reasons = [
        a["reason"]
        for a in plan["actions"]
        if a["action"] == "optimize_incremental"
    ]
    assert any("sort order" in r for r in reasons), plan["actions"]
    # recovery: the incremental cycle rewrites ONLY the 8 unsorted
    # commits; the sorted commit's files are inherited by pointer
    sorted_files = {
        rel
        for rel in _load_manifest(root, m9["version"])["files"]
        if rel.split(os.sep)[1] == m9["commit_id"]
    }
    out = snapshot_optimize_incremental(spark, root)
    assert out["files_kept"] == len(sorted_files)
    m_after = _load_manifest(root, snapshot_versions(root)[-1])
    assert sorted_files <= set(m_after["files"])  # kept by pointer
    plan2 = snapshot_maintenance_plan(root)
    assert plan2["metrics"]["unsorted_commits"] == 0
    assert not any(
        "sort order" in a["reason"] for a in plan2["actions"]
    )
    assert snapshot_read(spark, root).count() == 90  # row-preserving
    # tables without a declared order never report the axis
    root2 = str(tmp_path / "plain")
    snapshot_commit(_batch(spark, 0, 10).coalesce(1), root2)
    assert snapshot_maintenance_plan(root2)["metrics"][
        "unsorted_commits"
    ] is None
