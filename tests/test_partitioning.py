"""Declared partition specs / hidden partitioning
(operators/partitioning.py + snapshot_commit(partition_transforms=)):
transform correctness (Spark expr == driver literal twin), guaranteed
commit/file pruning with bounded sidecar opens, spec stickiness and
evolution, null partitions, expire on hive-layout commits, and the
batch data source planning through the transforms."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators import partitioning as P
from airflow_postgres_csv_spark.operators import snapshots as S
from airflow_postgres_csv_spark.operators.snapshots import (
    snapshot_commit,
    snapshot_expire,
    snapshot_read,
    snapshot_scan,
    snapshot_scan_files,
)

_BASE = dt.datetime(2024, 1, 1)


def _events(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id",
        (
            F.lit(_BASE.isoformat()).cast("timestamp")
            + F.make_interval(hours=F.col("id"))
        ).alias("ts"),
        (F.col("id") % 37).alias("user_id"),
        (F.col("id") % 5).cast("string").alias("kind"),
    )


def test_transform_exprs_match_driver_literals(spark):
    """The Spark transform expressions and the driver-side literal twins
    must agree bit-for-bit on every supported transform/type — a
    mismatch between them prunes LIVE files."""
    df = _events(spark, 0, 500)
    spec = P.normalize_spec(
        [
            ("ts", "day"), ("ts", "hour"), ("ts", "month"), ("ts", "year"),
            ("user_id", "bucket", 16), ("kind", "bucket", 7),
            ("id", "truncate", 100), ("kind", "truncate", 1),
            ("user_id", "identity"),
        ]
    )
    P.validate_spec(spec, df.schema)
    rows = df.select(
        "ts", "user_id", "kind", "id", *P.transform_columns(spec, df.schema)
    ).collect()
    for r in rows:
        src = {"ts": r.ts, "user_id": r.user_id, "kind": r.kind, "id": r.id}
        for i, f in enumerate(spec):
            assert r[f"_p{i}"] == P.transform_literal(f, src[f[0]]), (f, r)


def test_spec_validation_rejects_bad_fields(spark):
    df = _events(spark, 0, 10)
    for bad in (
        [("nope", "day")],
        [("user_id", "day")],           # not temporal
        [("ts", "bucket", 8)],          # bucket needs int/string
        [("ts", "hour", 3)],            # arg on argless transform
        [("id", "bucket")],             # missing arg
        [("id", "bucket", 0)],          # non-positive arg
        [("id", "wat")],
        [],
    ):
        with pytest.raises(ValueError):
            P.validate_spec(P.normalize_spec(bad), df.schema)


def test_partition_pruning_guaranteed_and_bounded(spark, tmp_path):
    """Commits whose partition summaries exclude the predicate are pruned
    from the ROOT alone (their sidecars never open — open-spy), file
    pruning uses exact tuples, and results equal the unpruned filter."""
    root = str(tmp_path / "t")
    # one commit per fortnight: day-partition summaries are disjoint
    for k in range(4):
        snapshot_commit(
            _events(spark, k * 336, (k + 1) * 336), root,
            partition_transforms=[("ts", "day"), ("user_id", "bucket", 8)]
            if k == 0 else None,  # sticky after the first commit
        )
    m = S._load_manifest(root, 4)
    assert len(m["partition_specs"]) == 1
    assert len(m["commit_partitions"]) == 4
    lo, hi = dt.datetime(2024, 1, 16), dt.datetime(2024, 1, 20)
    S._metadata_cache_clear()
    opened: list[str] = []
    real = S._sidecar_json

    def spy(root_, rel, strict):
        opened.append(rel)
        return real(root_, rel, strict)

    orig = S._sidecar_json
    S._sidecar_json = spy
    try:
        plan = snapshot_scan_files(root, ranges={"ts": (lo, hi)})
    finally:
        S._sidecar_json = orig
    # days 15..19 live in commit 2 only: 3 of 4 commits pruned from the
    # root, exactly one sidecar opened
    assert plan["commits_skipped"] == 3, plan
    assert len(opened) == 1, opened
    assert 0 < plan["kept"] < m["n_files"] / 4
    got = (
        snapshot_scan(spark, root, ranges={"ts": (lo, hi)})
        .where(F.col("ts").between(lo, hi))
        .count()
    )
    assert got == 97  # hourly rows in [Jan16 00:00, Jan20 00:00]
    want = (
        snapshot_read(spark, root).where(F.col("ts").between(lo, hi)).count()
    )
    assert got == want
    # bucket equality prunes inside surviving commits
    plan_eq = snapshot_scan_files(root, ranges={"user_id": (21, 21)})
    assert plan_eq["kept"] < m["n_files"] / 4
    got_eq = (
        snapshot_scan(spark, root, ranges={"user_id": (21, 21)})
        .where(F.col("user_id") == 21)
        .count()
    )
    assert got_eq == snapshot_read(spark, root).where(
        F.col("user_id") == 21
    ).count()


def test_spec_evolution_prunes_per_commit_spec(spark, tmp_path):
    """Commits written under spec 0 (day) and spec 1 (day+bucket) prune
    under THEIR OWN transforms; the evolved spec is sticky afterwards."""
    root = str(tmp_path / "t")
    snapshot_commit(
        _events(spark, 0, 200), root, partition_transforms=[("ts", "day")]
    )
    snapshot_commit(
        _events(spark, 200, 400), root,
        partition_transforms=[("ts", "day"), ("user_id", "bucket", 4)],
    )
    snapshot_commit(_events(spark, 400, 600), root)  # sticky spec 1
    m = S._load_manifest(root, 3)
    assert len(m["partition_specs"]) == 2
    assert sorted(cp["s"] for cp in m["commit_partitions"].values()) == [0, 1, 1]
    # a bucket predicate prunes files only in spec-1 commits, never drops
    # spec-0 rows
    got = (
        snapshot_scan(spark, root, ranges={"user_id": (3, 3)})
        .where(F.col("user_id") == 3)
        .count()
    )
    want = snapshot_read(spark, root).where(F.col("user_id") == 3).count()
    assert got == want
    # day predicate prunes across both specs
    lo, hi = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 7)
    plan = snapshot_scan_files(root, ranges={"ts": (lo, hi)})
    assert plan["skipped"] > 0
    got2 = (
        snapshot_scan(spark, root, ranges={"ts": (lo, hi)})
        .where(F.col("ts").between(lo, hi))
        .count()
    )
    assert got2 == snapshot_read(spark, root).where(
        F.col("ts").between(lo, hi)
    ).count()


def test_null_partition_values_prune_only_under_predicates(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        "id",
        F.when(F.col("id") < 50, F.col("id") % 7).alias("grp"),
    )
    snapshot_commit(df, root, partition_transforms=[("grp", "identity")])
    assert snapshot_read(spark, root).count() == 100  # nulls readable
    # grp = 3: null-partition files excluded (NULL never matches =)
    got = (
        snapshot_scan(spark, root, ranges={"grp": (3, 3)})
        .where(F.col("grp") == 3)
        .count()
    )
    assert got == 7  # ids 3,10,...,45
    plan = snapshot_scan_files(root, ranges={"grp": (3, 3)})
    assert plan["skipped"] > 0


def test_expire_collects_partitioned_commits(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_commit(
        _events(spark, 0, 100), root,
        partition_transforms=[("user_id", "bucket", 4)],
    )
    snapshot_commit(
        _events(spark, 0, 100), root, mode="overwrite",
    )
    out = snapshot_expire(root, keep_last=1)
    assert out["removed_data_files"] > 0
    assert snapshot_read(spark, root).count() == 100


def test_batch_source_prunes_through_partition_spec(spark, tmp_path):
    """The snapshot_table data source's pushFilters plans through the
    declared transforms: a day-range predicate keeps a strict subset of
    files, and SQL results stay exact."""
    from airflow_postgres_csv_spark.sources.snapshot_batch import (
        SnapshotBatchReader,
        register_snapshot_table,
    )
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    register_snapshot_table(spark)
    root = str(tmp_path / "t")
    for k in range(3):
        snapshot_commit(
            _events(spark, k * 240, (k + 1) * 240), root,
            partition_transforms=[("ts", "day")] if k == 0 else None,
        )
    r = SnapshotBatchReader(None, {"path": root})
    n_all = len(r.planned_files())
    list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("ts",), dt.datetime(2024, 1, 12)),
                LessThan(("ts",), dt.datetime(2024, 1, 14)),
            ]
        )
    )
    assert 0 < len(r.planned_files()) < n_all
    got = (
        spark.read.format("snapshot_table")
        .load(root)
        .where(F.col("ts") >= dt.datetime(2024, 1, 12))
        .where(F.col("ts") < dt.datetime(2024, 1, 14))
        .count()
    )
    assert got == 48


def test_compact_preserves_partition_spec(spark, tmp_path):
    """OPTIMIZE on a hidden-partitioned table must not destroy the
    declared layout (Iceberg rewrites stay within the spec): after
    snapshot_compact the table still has per-commit partition summaries,
    day predicates still prune from the root, and rows are exact."""
    root = str(tmp_path / "t")
    for k in range(3):
        snapshot_commit(
            _events(spark, k * 240, (k + 1) * 240), root,
            partition_transforms=[("ts", "day")] if k == 0 else None,
        )
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_compact

    m = snapshot_compact(spark, root, target_bytes=1 << 30)
    assert m["commit_partitions"], "rewrite lost the partition summaries"
    assert len(m["partition_specs"]) == 1
    lo, hi = dt.datetime(2024, 1, 12), dt.datetime(2024, 1, 14)
    plan = snapshot_scan_files(root, ranges={"ts": (lo, hi)})
    assert plan["skipped"] > 0 and 0 < plan["kept"] < m["n_files"]
    got = (
        snapshot_scan(spark, root, ranges={"ts": (lo, hi)})
        .where((F.col("ts") >= lo) & (F.col("ts") < hi))
        .count()
    )
    assert got == 48
    assert snapshot_read(spark, root).count() == 720
    # curve-clustered rewrite keeps the layout too (sorts within dirs)
    m2 = snapshot_compact(
        spark, root, target_bytes=1 << 30, zorder_by=("user_id", "id")
    )
    assert m2["commit_partitions"]
    assert snapshot_read(spark, root).count() == 720


def test_optimize_incremental_preserves_partition_spec(spark, tmp_path):
    """Incremental OPTIMIZE on a hidden-partitioned table rewrites only
    the unoptimized tail — WITHIN the declared layout: the new commit
    carries partition summaries, old optimized files stay by pointer,
    day pruning still answers from the root, rows exact."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_optimize_incremental,
    )

    root = str(tmp_path / "t")
    for k in range(2):
        snapshot_commit(
            _events(spark, k * 240, (k + 1) * 240), root,
            partition_transforms=[("ts", "day")] if k == 0 else None,
        )
    m1 = snapshot_optimize_incremental(
        spark, root, zorder_by=("user_id", "id"), target_bytes=1 << 30
    )
    assert m1["commit_partitions"] and m1["partition_specs"]
    # fresh unoptimized arrivals, then a second incremental cycle
    snapshot_commit(_events(spark, 480, 720), root)
    m2 = snapshot_optimize_incremental(
        spark, root, zorder_by=("user_id", "id"), target_bytes=1 << 30
    )
    assert m2["files_rewritten"] > 0
    assert len(m2["commit_partitions"]) == len(m2["commit_files"])
    lo, hi = dt.datetime(2024, 1, 22), dt.datetime(2024, 1, 24)
    plan = snapshot_scan_files(root, ranges={"ts": (lo, hi)})
    assert plan["skipped"] > 0
    got = (
        snapshot_scan(spark, root, ranges={"ts": (lo, hi)})
        .where((F.col("ts") >= lo) & (F.col("ts") < hi))
        .count()
    )
    assert got == 48
    assert snapshot_read(spark, root).count() == 720


def test_cow_rewrites_preserve_partition_spec(spark, tmp_path):
    """COW merge / MERGE INTO / range delete on a hidden-partitioned
    table rewrite their files WITHIN the declared layout: the rewrite
    commit re-records partition values (derived back from the hive
    paths by _publish), pruning still answers from the root, and every
    read path stays exact."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_delete,
        snapshot_merge,
        snapshot_merge_into,
    )

    root = str(tmp_path / "t")
    for k in range(2):
        snapshot_commit(
            _events(spark, k * 240, (k + 1) * 240), root,
            partition_transforms=[("ts", "day")] if k == 0 else None,
        )
    # COW merge: replace some rows' user_id
    updates = _events(spark, 100, 120).withColumn(
        "user_id", F.lit(999).cast("bigint")
    )
    m = snapshot_merge(spark, root, updates, key="id")
    assert set(m["commit_partitions"]) >= {m["commit_id"]}, "merge lost spec"
    # MERGE INTO with an update clause
    src = _events(spark, 200, 210).withColumn("kind", F.lit("9"))
    m2 = snapshot_merge_into(
        spark, root, src, key="id", matched_update={"kind": "s.kind"}
    )
    assert m2["commit_id"] in m2["commit_partitions"]
    # COW range delete
    m3 = snapshot_delete(spark, root, "id", 50, 60)
    assert m3["commit_id"] in m3["commit_partitions"]
    # pruning still works post-rewrites and rows are exact
    lo, hi = dt.datetime(2024, 1, 12), dt.datetime(2024, 1, 14)
    plan = snapshot_scan_files(root, ranges={"ts": (lo, hi)})
    assert plan["skipped"] > 0
    got = snapshot_read(spark, root)
    assert got.count() == 480 - 11  # ids 50..60 deleted
    assert got.where(F.col("user_id") == 999).count() == 20
    assert got.where(F.col("kind") == "9").count() == 10


def test_staged_source_write_into_spec_table_is_safe(spark, tmp_path):
    """The batch data source's executor-staged Arrow writes don't apply
    partition transforms (the staging tasks write plain files). On a
    hidden-partitioned table such a commit must record NO partition
    values — never a wrong rollup — so reads stay exact and partition
    pruning simply skips nothing for that commit (zone maps still
    apply). Later engine commits keep partitioning."""
    from airflow_postgres_csv_spark.sources.snapshot_batch import (
        register_snapshot_table,
    )

    register_snapshot_table(spark)
    root = str(tmp_path / "t")
    snapshot_commit(
        _events(spark, 0, 240), root, partition_transforms=[("ts", "day")]
    )
    # staged write path (spark.write through the data source)
    _events(spark, 240, 480).write.format("snapshot_table").mode(
        "append"
    ).save(root)
    m = S._load_manifest(root, 2)
    staged_cid = m["commit_id"]
    assert staged_cid not in m.get("commit_partitions", {}), (
        "staged commit must not claim partition values it doesn't have"
    )
    assert snapshot_read(spark, root).count() == 480
    # a day predicate prunes partitioned commit-1 files but keeps ALL of
    # the staged commit's files (no wrong pruning), result exact
    lo, hi = dt.datetime(2024, 1, 12), dt.datetime(2024, 1, 14)
    got = (
        snapshot_scan(spark, root, ranges={"ts": (lo, hi)})
        .where((F.col("ts") >= lo) & (F.col("ts") < hi))
        .count()
    )
    assert got == 48
    # the NEXT engine commit re-applies the sticky spec
    m3 = snapshot_commit(_events(spark, 480, 520), root)
    assert m3["commit_id"] in m3["commit_partitions"]
