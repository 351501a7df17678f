"""Versioned snapshot datasets (operators/snapshots.py): commit atomicity,
pinned reads under concurrent commits, schema-drift rejection, file-level
diff, and expire GC including orphaned (crashed-commit) data dirs."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.snapshots import (
    snapshot_commit,
    snapshot_diff,
    snapshot_expire,
    snapshot_read,
    snapshot_versions,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_commit_append_and_read_latest(spark, tmp_path):
    root = str(tmp_path / "snap")
    m1 = snapshot_commit(_df(spark, 0, 10), root)
    m2 = snapshot_commit(_df(spark, 10, 25), root)
    assert (m1["version"], m2["version"]) == (1, 2)
    assert m2["parent"] == 1
    assert snapshot_versions(root) == [1, 2]
    assert snapshot_read(spark, root).count() == 25
    assert snapshot_read(spark, root, version=1).count() == 10
    # append reuses v1's files verbatim — no rewrite
    assert set(m1["files"]) <= set(m2["files"])


def test_overwrite_pins_only_new_files_and_time_travel_survives(spark, tmp_path):
    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10), root)
    m2 = snapshot_commit(_df(spark, 100, 103), root, mode="overwrite")
    assert snapshot_read(spark, root).count() == 3
    assert sorted(r.id for r in snapshot_read(spark, root, version=2).collect()) == [100, 101, 102]
    # the overwritten version is still readable (files not deleted until expire)
    assert snapshot_read(spark, root, version=1).count() == 10
    d = snapshot_diff(root, 1, 2)
    assert d["unchanged"] == 0 and d["added"] == sorted(m2["files"]) and d["removed"]


def test_pinned_read_immune_to_concurrent_commit(spark, tmp_path):
    """A reader that resolved version 1 sees exactly v1's rows even if a
    commit lands before the action runs — the manifest pins files, the
    reader never lists the directory."""
    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10), root)
    pinned = snapshot_read(spark, root, version=1)
    snapshot_commit(_df(spark, 10, 50), root)  # concurrent append
    assert pinned.count() == 10


def test_schema_drift_rejected_on_append(spark, tmp_path):
    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 5), root)
    drifted = spark.range(5).select(F.col("id").cast("int"), F.lit("x").alias("v"))
    with pytest.raises(ValueError, match="schema drift"):
        snapshot_commit(drifted, root)
    m = snapshot_commit(drifted, root, allow_schema_change=True)
    assert m["version"] == 2


def test_expire_gc_removes_unreferenced_and_orphaned(spark, tmp_path):
    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10), root)
    snapshot_commit(_df(spark, 100, 103), root, mode="overwrite")
    # simulate a crashed commit: data dir written, manifest never renamed
    orphan = os.path.join(root, "data", "deadbeefcafe")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-orphan.parquet"), "w") as f:
        f.write("junk")
    res = snapshot_expire(root, keep_last=1)
    assert res["expired_versions"] == [1] and res["kept_versions"] == [2]
    assert res["removed_data_files"] >= 2  # v1's parquet + the orphan
    assert not os.path.exists(orphan)
    # latest still intact, v1 gone
    assert snapshot_read(spark, root).count() == 3
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, root, version=1)


def test_crash_before_manifest_rename_leaves_previous_version(spark, tmp_path):
    """The commit point is the manifest rename: a temp manifest plus data
    dir with no final manifest must leave readers at the prior version."""
    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10), root)
    # fabricate the pre-rename state of a second commit
    os.makedirs(os.path.join(root, "data", "aaaa00000000"))
    tmp_manifest = os.path.join(root, "manifests", "v000002.json.tmp-aaaa00000000")
    with open(tmp_manifest, "w") as f:
        json.dump({"version": 2}, f)
    assert snapshot_versions(root) == [1]
    assert snapshot_read(spark, root).count() == 10


def test_changes_feed_is_exactly_the_appended_rows(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_changes

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10), root)
    snapshot_commit(_df(spark, 10, 25), root)
    got = sorted(r.id for r in snapshot_changes(spark, root, 1, 2).collect())
    assert got == list(range(10, 25))
    # same-version delta is empty but schema-correct
    empty = snapshot_changes(spark, root, 2, 2)
    assert empty.count() == 0 and set(empty.columns) == {"id", "v"}


def test_changes_feed_rejects_rewritten_range(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_changes

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10), root)
    snapshot_commit(_df(spark, 0, 3), root, mode="overwrite")
    with pytest.raises(ValueError, match="not a row delta"):
        snapshot_changes(spark, root, 1, 2)


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_compact

    root = str(tmp_path / "snap")
    # many small commits -> many small files
    for lo in range(0, 50, 10):
        snapshot_commit(_df(spark, lo, lo + 10).repartition(4), root)
    before = snapshot_read(spark, root)
    n_before = before.count()
    m = snapshot_compact(spark, root, target_bytes=1 << 30)  # everything in 1 file
    assert m["n_files"] == 1 and m["files_before"] >= 20
    after = snapshot_read(spark, root)
    assert after.count() == n_before
    assert sorted(r.id for r in after.collect()) == list(range(50))
    # pre-compaction versions still readable (pinned file lists intact)
    assert snapshot_read(spark, root, version=1).count() == 10


def test_empty_commit_roundtrip(spark, tmp_path):
    root = str(tmp_path / "snap")
    m = snapshot_commit(_df(spark, 0, 0), root)
    assert m["version"] == 1
    out = snapshot_read(spark, root)
    assert out.count() == 0
    assert set(out.columns) == {"id", "v"}


def test_zone_map_pruning_skips_disjoint_files(spark, tmp_path):
    """Four single-file commits with disjoint id ranges: a mid-range scan
    must skip the two provably-disjoint files at the manifest level and
    still return exactly the right rows."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_scan,
        snapshot_scan_files,
    )

    root = str(tmp_path / "snap")
    for lo in (0, 100, 200, 300):
        snapshot_commit(_df(spark, lo, lo + 100).coalesce(1), root)
    plan = snapshot_scan_files(root, "id", 120, 180)
    assert (plan["kept"], plan["skipped"], plan["no_stats"]) == (1, 3, 0), plan
    # hierarchical pruning: the three disjoint commits are skipped from the
    # root manifest's commit-level ranges alone — only ONE sidecar is read
    assert plan["commits_skipped"] == 3 and plan["sidecars_loaded"] == 1, plan
    got = sorted(r.id for r in snapshot_scan(spark, root, "id", 120, 180).collect())
    assert got == list(range(120, 181))
    # no stats for an unknown column -> everything kept (safe default)
    plan2 = snapshot_scan_files(root, "nope", 0, 1)
    assert plan2["skipped"] == 0 and plan2["kept"] == 4
    # incomparable probe type (string range vs numeric stats) -> files kept,
    # never a TypeError from the planner
    plan3 = snapshot_scan_files(root, "id", "a", "b")
    assert plan3["skipped"] == 0 and plan3["kept"] == 4


def test_zone_map_disjoint_range_returns_empty(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_scan,
        snapshot_scan_files,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 50).coalesce(1), root)
    assert snapshot_scan_files(root, "id", 1000, 2000)["skipped"] == 1
    out = snapshot_scan(spark, root, "id", 1000, 2000)
    assert out.count() == 0 and set(out.columns) == {"id", "v"}


def test_merge_rewrites_only_intersecting_files(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_merge

    root = str(tmp_path / "snap")
    for lo in (0, 100, 200, 300):
        snapshot_commit(_df(spark, lo, lo + 100).coalesce(1), root)
    before = snapshot_read(spark, root)
    assert before.count() == 400
    old_files = set(snapshot_commit.__globals__["_load_manifest"](root, 4)["files"])
    updates = _df(spark, 150, 160).select("id", (F.col("id") * 7).alias("v"))
    m = snapshot_merge(spark, root, updates, key="id")
    # only the [100,200) file was rewritten; the other three inherited verbatim
    inherited = set(m["files"]) & old_files
    assert len(inherited) == 3
    after = snapshot_read(spark, root)
    assert after.count() == 400
    got = {r.id: r.v for r in after.collect()}
    for i in range(400):
        assert got[i] == (i * 7 if 150 <= i < 160 else i * 2)
    # pre-merge version still time-travelable
    assert {r.id: r.v for r in snapshot_read(spark, root, version=4).collect()}[155] == 310


def test_merge_insert_only_touches_no_files(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_merge

    root = str(tmp_path / "snap")
    for lo in (0, 100):
        snapshot_commit(_df(spark, lo, lo + 100).coalesce(1), root)
    old_files = set(snapshot_commit.__globals__["_load_manifest"](root, 2)["files"])
    inserts = _df(spark, 1000, 1005)
    m = snapshot_merge(spark, root, inserts, key="id")
    assert old_files <= set(m["files"])  # nothing rewritten
    assert snapshot_read(spark, root).count() == 205


def test_merge_empty_updates_is_metadata_noop(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_merge

    root = str(tmp_path / "snap")
    m1 = snapshot_commit(_df(spark, 0, 10), root)
    m = snapshot_merge(spark, root, _df(spark, 0, 0), key="id")
    assert m["version"] == 2 and m["files"] == m1["files"]
    assert snapshot_read(spark, root).count() == 10


def test_merge_schema_mismatch_raises(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_merge

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10), root)
    bad = spark.range(3).select(F.col("id"))
    with pytest.raises(ValueError, match="schema"):
        snapshot_merge(spark, root, bad, key="id")


def test_delete_range_rewrites_only_intersecting_files(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_delete

    root = str(tmp_path / "snap")
    for lo in (0, 100, 200, 300):
        snapshot_commit(_df(spark, lo, lo + 100).coalesce(1), root)
    old_files = set(snapshot_commit.__globals__["_load_manifest"](root, 4)["files"])
    m = snapshot_delete(spark, root, "id", 150, 249)  # spans files 2 and 3
    assert len(set(m["files"]) & old_files) == 2  # files 1 and 4 inherited
    after = sorted(r.id for r in snapshot_read(spark, root).collect())
    assert after == [i for i in range(400) if not (150 <= i <= 249)]
    # disjoint delete = metadata-only bump
    m2 = snapshot_delete(spark, root, "id", 5000, 6000)
    assert set(m2["files"]) == set(m["files"])
    assert snapshot_read(spark, root).count() == 300


def test_streaming_snapshot_sink_exactly_once(spark, tmp_path):
    """Stream → snapshot versions: one commit per micro-batch, replayed
    batches skipped, restart from checkpoint ingests only new files."""
    import os as _os

    from airflow_postgres_csv_spark.streaming.sinks import (
        snapshot_batch_commit,
        start_snapshot_sink,
    )

    src = str(tmp_path / "in")
    _os.makedirs(src)

    def add_file(idx, lo, hi):
        _df(spark, lo, hi).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage_{idx}")
        )
        for f in _os.listdir(str(tmp_path / f"stage_{idx}")):
            if f.endswith(".parquet"):
                _os.rename(
                    str(tmp_path / f"stage_{idx}" / f), _os.path.join(src, f"{idx:03d}.parquet")
                )

    add_file(0, 0, 10)
    add_file(1, 10, 30)
    root = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("id long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_snapshot_sink(stream, root, ckpt)
    q.processAllAvailable()
    q.stop()
    assert len(snapshot_versions(root)) == 2
    assert snapshot_read(spark, root).count() == 30
    # replaying an already-committed batch id is a no-op
    assert snapshot_batch_commit(_df(spark, 0, 10), 0, root) is False
    assert len(snapshot_versions(root)) == 2
    # restart with the same checkpoint: nothing new -> no new versions;
    # a new file -> exactly one more version
    q2 = start_snapshot_sink(
        spark.readStream.schema("id long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        root,
        ckpt,
    )
    q2.processAllAvailable()
    add_file(2, 30, 35)
    q2.processAllAvailable()
    q2.stop()
    assert len(snapshot_versions(root)) == 3
    assert snapshot_read(spark, root).count() == 35


def test_zorder_clustered_commit_prunes_both_dimensions(spark, tmp_path):
    """Z-order-clustered commits give every file a tight extent on BOTH
    columns, so a small 2-D window skips most files; a 1-D-sorted layout
    prunes only its sort column. The cross-component payoff of
    layout.zorder_value + manifest zone maps."""
    from airflow_postgres_csv_spark.operators.layout import zorder_value
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_scan,
        snapshot_scan_files,
    )

    pts = (
        spark.range(4096)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
    )
    n_files = 16
    zroot = str(tmp_path / "zsnap")
    snapshot_commit(
        pts.repartitionByRange(n_files, zorder_value(F.col("x"), F.col("y"), bits=6))
        .sortWithinPartitions(zorder_value(F.col("x"), F.col("y"), bits=6)),
        zroot,
    )
    lroot = str(tmp_path / "lsnap")
    snapshot_commit(
        pts.repartitionByRange(n_files, "x").sortWithinPartitions("x"), lroot
    )
    window = {"x": (0, 15), "y": (0, 15)}  # 1/16 of the 64x64 grid
    zplan = snapshot_scan_files(zroot, ranges=window)
    lplan = snapshot_scan_files(lroot, ranges=window)
    # Z-order: the window touches few interleaved buckets; linear: every
    # x-slab spans all y, so only the x bound prunes.
    assert zplan["skipped"] > lplan["skipped"], (zplan, lplan)
    assert zplan["skipped"] >= n_files // 2, zplan
    got = snapshot_scan(spark, zroot, ranges=window)
    rows = {(r.x, r.y) for r in got.collect()}
    assert rows == {(x, y) for x in range(16) for y in range(16)}


def test_write_audit_publish_rejects_bad_batch(spark, tmp_path):
    """Expectations audit the staged files BEFORE the manifest publishes:
    a violating batch aborts (staging removed, counts reported) and the
    dataset stays at its previous version; a clean batch commits."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        SnapshotExpectationError,
    )

    root = str(tmp_path / "snap")
    rules = [("v_positive", "v >= 0"), ("id_not_null", "id IS NOT NULL")]
    snapshot_commit(_df(spark, 0, 10), root, expect=rules)
    bad = spark.range(5).select(
        F.when(F.col("id") == 3, None).otherwise(F.col("id")).alias("id"),
        (F.col("id") - 2).alias("v"),  # two negative v values
    )
    with pytest.raises(SnapshotExpectationError) as ei:
        snapshot_commit(bad, root, expect=rules)
    assert ei.value.violations == {"v_positive": 2, "id_not_null": 1}
    # dataset unchanged, no stray staging dirs beyond v1's commit
    assert snapshot_versions(root) == [1]
    assert snapshot_read(spark, root).count() == 10
    data_root = os.path.join(root, "data")
    assert len(os.listdir(data_root)) == 1


def test_schema_evolution_reads_each_version_under_its_schema(spark, tmp_path):
    """Adding a column via allow_schema_change: pre-evolution files read
    as NULL in the new column under the latest schema, and time travel to
    the old version returns the old column set."""
    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 5), root)
    evolved = _df(spark, 5, 8).withColumn("w", F.col("id") * 10)
    snapshot_commit(evolved, root, allow_schema_change=True)
    latest = snapshot_read(spark, root)
    assert set(latest.columns) == {"id", "v", "w"}
    got = {r.id: r.w for r in latest.collect()}
    assert got[0] is None and got[6] == 60
    old = snapshot_read(spark, root, version=1)
    assert set(old.columns) == {"id", "v"}


def test_bloom_point_lookup_skips_files_zone_maps_cannot(spark, tmp_path):
    """Hash-distributed keys overlap every file's [min,max] range, so zone
    maps alone keep all files; the per-file Bloom bitsets skip the files
    that provably lack the key. No false negatives: every present key is
    found with exactly its rows."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_lookup,
        snapshot_lookup_files,
        snapshot_scan_files,
    )

    root = str(tmp_path / "snap")
    # 4 files, each holding ids with a distinct residue mod 4 — every
    # file's id range spans nearly [residue, 400), so ranges all overlap
    for res in range(4):
        part = (
            spark.range(400)
            .where(F.col("id") % 4 == res)
            .select("id", (F.col("id") * 2).alias("v"))
            .coalesce(1)
        )
        snapshot_commit(part, root, bloom_cols=["id"])
    # range pruning can't skip anything for a point in the middle
    assert snapshot_scan_files(root, "id", 201, 201)["skipped"] == 0
    plan = snapshot_lookup_files(root, "id", 201)
    assert plan["skipped"] >= 2, plan  # bloom kills (almost) all wrong files
    rows = snapshot_lookup(spark, root, "id", 201).collect()
    assert [(r.id, r.v) for r in rows] == [(201, 402)]
    # absent key: usually every file skipped; never a wrong row
    assert snapshot_lookup(spark, root, "id", 100000).count() == 0


def _gathered_blooms(root, manifest):
    """Union of per-file bloom bitsets across the manifest's sidecars."""
    from airflow_postgres_csv_spark.operators.snapshots import _load_sidecar

    out = {}
    for cid in {f.split(os.sep)[1] for f in manifest["files"]}:
        out.update(_load_sidecar(root, manifest, cid).get("blooms", {}))
    return {rel: b for rel, b in out.items() if rel in set(manifest["files"])}


def test_bloom_index_carried_and_rebuilt_through_merge(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_lookup,
        snapshot_merge,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 100).coalesce(1), root, bloom_cols=["id"])
    # plain append inherits the bloom config without re-passing it
    snapshot_commit(_df(spark, 100, 200).coalesce(1), root)
    m = _load_manifest(root, 2)
    assert m["bloom"]["cols"] == ["id"] and len(_gathered_blooms(root, m)) == 2
    updates = _df(spark, 150, 155).select("id", (F.col("id") * 9).alias("v"))
    m3 = snapshot_merge(spark, root, updates, key="id")
    # every pinned file has a bloom entry (in its sidecar) after the rewrite
    assert set(_gathered_blooms(root, m3)) == set(m3["files"])
    got = {r.id: r.v for r in snapshot_lookup(spark, root, "id", 152).collect()}
    assert got == {152: 1368}


def test_bloom_key_type_validation_and_respec_guard(spark, tmp_path):
    """Bloom columns are restricted to int/string keys (float/bool render
    differently between Spark's cast-to-string and Python's str → silent
    false negatives), and re-specifying a different bloom geometry on a
    later commit is rejected (carried bitsets would be probed wrong)."""
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_lookup

    root = str(tmp_path / "snap")
    floats = spark.range(10).select(
        F.col("id"), (F.col("id") / 4).alias("f"), F.lit("s").alias("s")
    )
    with pytest.raises(ValueError, match="integer/string"):
        snapshot_commit(floats, root, bloom_cols=["f"])
    snapshot_commit(floats, root, bloom_cols=["id", "s"])
    with pytest.raises(ValueError, match="geometry"):
        snapshot_commit(floats, root, bloom_cols=["id"], bloom_bits=8192)
    # probing with a non-int/string value is a loud error, not a miss
    with pytest.raises(ValueError, match="int or string"):
        snapshot_lookup(spark, root, "id", 1.5).count()


def test_concurrent_publish_conflict_first_writer_wins(spark, tmp_path):
    """If another writer publishes version N+1 between our version
    resolution and publish, the commit raises instead of silently
    clobbering the winner's manifest; a retry lands as the next version."""
    import json as _json

    from airflow_postgres_csv_spark.operators.snapshots import (
        SnapshotConflictError,
        _load_manifest,
        _manifest_path,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10), root)
    winner = _load_manifest(root, 1)
    # simulate the race: v2 appears while our commit is writing data
    real_versions = snapshot_versions(root)
    with open(_manifest_path(root, 2), "w") as f:
        _json.dump({**winner, "version": 2, "parent": 1}, f)
    # monkey-free race: call the internal publish path via snapshot_commit
    # after removing v2 from what the commit sees is impossible — instead
    # commit normally and assert it lands as v3 (no clobber), then force a
    # direct conflict through _publish.
    from airflow_postgres_csv_spark.operators import snapshots as S

    with pytest.raises(SnapshotConflictError):
        S._publish(
            root,
            real_versions,
            {
                "mode": "append",
                "commit_id": "deadbeef0000",
                "files": winner["files"],
                "n_files": len(winner["files"]),
                "schema": winner["schema"],
            },
            "deadbeef0000",
            None,
        )
    # the winner's manifest is untouched
    assert _load_manifest(root, 2)["parent"] == 1
    # and a normal commit retries cleanly on top as v3 (the fabricated v2
    # pinned v1's 10 rows, so v3 = those 10 + the 2 appended here)
    m3 = snapshot_commit(_df(spark, 10, 12), root)
    assert m3["version"] == 3
    assert snapshot_read(spark, root).count() == 12


def test_root_manifest_stays_small_stats_live_in_sidecars(spark, tmp_path):
    """The root manifest holds NO per-file statistics: its byte size is
    (nearly) independent of the bloom configuration — the bitsets and zone
    maps live in per-commit sidecar files — so at ~1M files planning reads
    O(relevant sidecars), not a gigabyte root JSON."""
    from airflow_postgres_csv_spark.operators.snapshots import _manifest_path

    roots = {}
    for label, kwargs in (
        ("plain", {}),
        ("bloom_small", {"bloom_cols": ["id"], "bloom_bits": 512}),
        ("bloom_big", {"bloom_cols": ["id"], "bloom_bits": 65536}),
    ):
        root = str(tmp_path / label)
        snapshot_commit(_df(spark, 0, 400).repartition(8), root, **kwargs)
        for lo in (400, 800):
            snapshot_commit(_df(spark, lo, lo + 400).repartition(8), root)
        m = json.load(open(_manifest_path(root, 3)))
        assert "stats" not in m and "blooms" not in m
        roots[label] = os.path.getsize(_manifest_path(root, 3))
    # 24 files, 3 commits: bloom config adds only its tiny cfg stanza
    assert abs(roots["bloom_big"] - roots["plain"]) < 200, roots
    assert abs(roots["bloom_big"] - roots["bloom_small"]) < 50, roots
    # and the lookups still work end-to-end through the sidecars
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_lookup

    got = snapshot_lookup(spark, str(tmp_path / "bloom_big"), "id", 777).collect()
    assert [(r.id, r.v) for r in got] == [(777, 1554)]


def test_delete_mor_writes_no_data_files(spark, tmp_path):
    """A 1-row merge-on-read delete is a metadata+tombstone commit: the
    pinned data file list is unchanged and no data file is rewritten —
    only a tiny delete-key file lands under the delete's own commit dir."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_delete_mor,
    )

    root = str(tmp_path / "snap")
    for lo in (0, 100):
        snapshot_commit(_df(spark, lo, lo + 100).coalesce(1), root)
    m2 = _load_manifest(root, 2)
    m3 = snapshot_delete_mor(spark, root, "id = 42", key_col="id")
    assert m3["files"] == m2["files"]  # zero data files rewritten
    assert len(m3["tombstones"]) == 1
    t = m3["tombstones"][0]
    assert t["key_col"] == "id" and t["n_keys"] == 1
    assert all(f.startswith(os.path.join("data", m3["commit_id"])) for f in t["files"])
    got = sorted(r.id for r in snapshot_read(spark, root).collect())
    assert got == [i for i in range(200) if i != 42]
    # time travel BEFORE the delete still sees the row
    assert 42 in {r.id for r in snapshot_read(spark, root, version=2).collect()}


def test_delete_mor_point_range_reinsert_and_compact_folds(spark, tmp_path):
    """Range + point MOR deletes stack; a key re-inserted AFTER the delete
    is exempt (tombstones bind to the commits present at delete time);
    compaction folds tombstones into a clean rewrite and expire collects
    the delete files."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_compact,
        snapshot_delete_mor,
        snapshot_expire,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 100).coalesce(1), root)
    snapshot_delete_mor(spark, root, "id >= 90", key_col="id")  # range
    snapshot_delete_mor(spark, root, "id = 7", key_col="id")  # point
    expect = [i for i in range(100) if i != 7 and i < 90]
    assert sorted(r.id for r in snapshot_read(spark, root).collect()) == expect
    # re-insert two deleted keys: the new commit postdates both tombstones
    snapshot_commit(_df(spark, 7, 8).unionByName(_df(spark, 95, 96)), root)
    assert sorted(r.id for r in snapshot_read(spark, root).collect()) == sorted(
        expect + [7, 95]
    )
    # lookup path honors tombstones too: 90 deleted, 95 re-inserted
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_lookup

    assert snapshot_lookup(spark, root, "id", 90).count() == 0
    assert snapshot_lookup(spark, root, "id", 95).count() == 1
    m = snapshot_compact(spark, root)
    assert m["tombstones"] == []
    assert sorted(r.id for r in snapshot_read(spark, root).collect()) == sorted(
        expect + [7, 95]
    )
    res = snapshot_expire(root, keep_last=1)
    assert res["removed_data_files"] >= 3  # old data + the two delete files
    # nothing dangles: the compacted version still reads clean
    assert snapshot_read(spark, root).count() == len(expect) + 2


def test_delete_mor_no_match_is_metadata_noop(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_delete_mor

    root = str(tmp_path / "snap")
    m1 = snapshot_commit(_df(spark, 0, 10), root)
    m2 = snapshot_delete_mor(spark, root, "id > 1000", key_col="id")
    assert m2["files"] == m1["files"] and m2["tombstones"] == []
    assert snapshot_read(spark, root).count() == 10


def test_changes_feed_rejects_tombstone_delta(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_changes,
        snapshot_delete_mor,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10), root)
    snapshot_delete_mor(spark, root, "id = 3", key_col="id")
    with pytest.raises(ValueError, match="tombstone"):
        snapshot_changes(spark, root, 1, 2)
    # append after the delete: v2->v3 is a pure append again
    snapshot_commit(_df(spark, 10, 15), root)
    got = sorted(r.id for r in snapshot_changes(spark, root, 2, 3).collect())
    assert got == list(range(10, 15))


def test_streaming_gate_survives_interleaved_maintenance(spark, tmp_path):
    """An interleaved compaction between micro-batches must not reset the
    exactly-once gate: the batch id is carried through manifest
    inheritance AND recovered by the max-scan, so a replayed batch is
    still skipped after maintenance commits."""
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_compact
    from airflow_postgres_csv_spark.streaming.sinks import snapshot_batch_commit

    root = str(tmp_path / "snap")
    assert snapshot_batch_commit(_df(spark, 0, 10), 0, root) is True
    assert snapshot_batch_commit(_df(spark, 10, 20), 1, root) is True
    snapshot_compact(spark, root)  # routine maintenance between batches
    # replay of batch 1 (crash-recovery scenario) must be a no-op
    assert snapshot_batch_commit(_df(spark, 10, 20), 1, root) is False
    assert snapshot_read(spark, root).count() == 20
    # and the next real batch commits normally
    assert snapshot_batch_commit(_df(spark, 20, 25), 2, root) is True
    assert snapshot_read(spark, root).count() == 25


def test_schema_evolution_grid_add_default_widen_drop(spark, tmp_path):
    """The full evolution grid across time-travel reads: add a column
    with a default, widen int->long, drop a column — every version reads
    under ITS manifest schema, and files written before an evolution are
    aligned (default-fill / cast / prune) rather than sampled."""
    from pyspark.sql.types import LongType

    root = str(tmp_path / "snap")
    v1 = spark.range(3).select(
        F.col("id").cast("int").alias("k"), F.lit("a").alias("name")
    )
    snapshot_commit(v1, root)
    # add `score` with default 100, widen k int->long
    v2 = spark.range(3, 6).select(
        F.col("id").alias("k"), F.lit("b").alias("name"), (F.col("id") * 10).alias("score")
    )
    snapshot_commit(v2, root, allow_schema_change=True, column_defaults={"score": 100})
    latest = snapshot_read(spark, root)
    assert [f.dataType for f in latest.schema.fields if f.name == "k"] == [LongType()]
    got = {r.k: (r.name, r.score) for r in latest.collect()}
    assert got[0] == ("a", 100) and got[4] == ("b", 40)  # default fills old files
    # drop `name`
    v3 = spark.range(6, 8).select(F.col("id").alias("k"), (F.col("id") * 10).alias("score"))
    snapshot_commit(v3, root, allow_schema_change=True)
    latest = snapshot_read(spark, root)
    assert set(latest.columns) == {"k", "score"}
    assert {r.k: r.score for r in latest.collect()} == {
        0: 100, 1: 100, 2: 100, 3: 30, 4: 40, 5: 50, 6: 60, 7: 70
    }
    # time travel: each version under its own schema
    assert set(snapshot_read(spark, root, version=1).columns) == {"k", "name"}
    assert set(snapshot_read(spark, root, version=2).columns) == {"k", "name", "score"}


def test_scan_and_lookup_apply_pinned_schema_after_evolution(spark, tmp_path):
    """Every manifest-driven read path (scan, lookup, changes) applies the
    version's pinned schema — after an allow_schema_change append, columns
    added later are present (NULL/default-filled) regardless of which file
    Spark would have sampled first."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_changes,
        snapshot_lookup,
        snapshot_scan,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 50).coalesce(1), root)
    evolved = _df(spark, 50, 100).withColumn("w", F.col("id") * 10)
    snapshot_commit(evolved.coalesce(1), root, allow_schema_change=True)
    out = snapshot_scan(spark, root, "id", 40, 60)
    assert set(out.columns) == {"id", "v", "w"}
    got = {r.id: r.w for r in out.collect()}
    assert got[40] is None and got[55] == 550
    assert {r.w for r in snapshot_lookup(spark, root, "id", 10).collect()} == {None}
    delta = snapshot_changes(spark, root, 1, 2)
    assert set(delta.columns) == {"id", "v", "w"}
    assert delta.count() == 50


def test_partition_batch_commits_prune_from_root_manifest_alone(spark, tmp_path):
    """One commit per partition value (the ingest-batch shape): an
    equality scan answers partition pruning from the root manifest's
    commit-level ranges — 4 of 5 commits skipped with exactly ONE sidecar
    read — and still returns exactly the right rows."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_scan,
        snapshot_scan_files,
    )

    root = str(tmp_path / "snap")
    cats = ["a", "b", "c", "d", "e"]
    for i, cat in enumerate(cats):
        part = spark.range(i * 20, i * 20 + 20).select(
            F.col("id"), F.lit(cat).alias("cat")
        )
        snapshot_commit(part, root, partition_by=["cat"])
    plan = snapshot_scan_files(root, ranges={"cat": ("c", "c")})
    assert plan["commits_skipped"] == 4 and plan["sidecars_loaded"] == 1, plan
    got = sorted(
        r.id for r in snapshot_scan(spark, root, ranges={"cat": ("c", "c")}).collect()
    )
    assert got == list(range(40, 60))


def test_snapshot_query_survives_total_cache_eviction(spark, sf_dir):
    """The round-5 flake class: a registered snapshot query whose staged
    temp dataset was deleted while its (cached) result could still
    recompute. The staging dirs now outlive the result, so even a total
    cache wipe between actions recomputes cleanly."""
    from airflow_postgres_csv_spark.queries.snapshot_queries import (
        snapshot_time_travel,
    )

    out = snapshot_time_travel(spark, sf_dir)
    first = out.count()
    spark.catalog.clearCache()  # hostile eviction of EVERY cached partition
    rows = out.collect()
    assert len(rows) == first and rows[0].n_nationkey == 0


def test_rollback_is_forward_commit_preserving_history(spark, tmp_path):
    """Rollback publishes a NEW version with the target's logical state:
    zero data movement, bad versions still time-travelable, and the
    streaming gate's batch-id high-water mark never moves backwards."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_rollback,
    )
    from airflow_postgres_csv_spark.streaming.sinks import snapshot_batch_commit

    root = str(tmp_path / "snap")
    snapshot_batch_commit(_df(spark, 0, 10), 0, root)  # v1, batch 0
    snapshot_commit(_df(spark, 10, 999).where("id < 20"), root)  # v2: bad batch
    m = snapshot_rollback(spark, root, to_version=1)
    assert m["version"] == 3 and m["mode"] == "rollback" and m["rolled_back_to"] == 1
    assert m["files"] == _load_manifest(root, 1)["files"]
    assert snapshot_read(spark, root).count() == 10
    assert snapshot_read(spark, root, version=2).count() == 20  # history intact
    # the replayed batch 0 is STILL skipped after rollback (gate not reset)
    assert snapshot_batch_commit(_df(spark, 0, 10), 0, root) is False


def test_tags_resolve_in_reads_and_protect_from_expire(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_expire,
        snapshot_tag,
        snapshot_tags,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10), root)
    snapshot_tag(root, "train-v1")  # defaults to latest
    snapshot_commit(_df(spark, 10, 30), root)
    snapshot_commit(_df(spark, 100, 103), root, mode="overwrite")
    assert snapshot_tags(root) == {"train-v1": 1}
    assert snapshot_read(spark, root, version="train-v1").count() == 10
    with pytest.raises(FileNotFoundError, match="no tag"):
        snapshot_read(spark, root, version="nope")
    # expire keeps the tagged version alive alongside the latest
    res = snapshot_expire(root, keep_last=1)
    assert res["kept_versions"] == [1, 3] and res["expired_versions"] == [2]
    assert snapshot_read(spark, root, version="train-v1").count() == 10
    # re-tagging replaces atomically
    snapshot_tag(root, "train-v1", version=3)
    assert snapshot_read(spark, root, version="train-v1").count() == 3


def test_delete_positional_exact_rows_no_key_needed(spark, tmp_path):
    """Positional delete vectors: address rows by (file, row_index), so
    duplicate-key tables delete EXACTLY the matching rows — no unique key
    required — and the commit writes no data files. Compaction folds the
    vectors like any tombstone."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_compact,
        snapshot_delete_positional,
    )

    root = str(tmp_path / "snap")
    # duplicate ids with distinct payloads: (id, v) pairs (0..49, v=id*2)
    # plus a second copy of ids 0..9 with v = -1
    dup = spark.range(10).select(F.col("id"), F.lit(-1).cast("long").alias("v"))
    snapshot_commit(_df(spark, 0, 50).coalesce(1), root)
    snapshot_commit(dup.coalesce(1), root)
    m2 = _load_manifest(root, 2)
    # delete only the duplicate copies (v = -1) of ids < 5: an equality
    # delete on id would wrongly remove the originals too
    m3 = snapshot_delete_positional(spark, root, "v = -1 AND id < 5")
    assert m3["files"] == m2["files"]  # no data file rewritten
    t = m3["tombstones"][0]
    assert t["kind"] == "positional" and t["n_keys"] == 5
    got = sorted((r.id, r.v) for r in snapshot_read(spark, root).collect())
    expect = sorted(
        [(i, i * 2) for i in range(50)] + [(i, -1) for i in range(5, 10)]
    )
    assert got == expect
    # stacking an equality MOR delete on top composes
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_delete_mor

    snapshot_delete_mor(spark, root, "id = 40", key_col="id")
    got = sorted((r.id, r.v) for r in snapshot_read(spark, root).collect())
    assert got == [p for p in expect if p[0] != 40]
    # compaction folds both tombstone kinds
    m = snapshot_compact(spark, root)
    assert m["tombstones"] == []
    got2 = sorted((r.id, r.v) for r in snapshot_read(spark, root).collect())
    assert got2 == [p for p in expect if p[0] != 40]


def test_delete_positional_scoped_to_addressed_files(spark, tmp_path):
    """A positional tombstone binds to the exact files it addresses:
    appends after the delete are exempt even when their rows match the
    original predicate, and a no-match delete is a metadata-only bump."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_delete_positional,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 20).coalesce(1), root)
    snapshot_delete_positional(spark, root, "id >= 15")
    assert sorted(r.id for r in snapshot_read(spark, root).collect()) == list(range(15))
    # re-append rows matching the old predicate: exempt
    snapshot_commit(_df(spark, 15, 18).coalesce(1), root)
    assert sorted(r.id for r in snapshot_read(spark, root).collect()) == list(
        range(18)
    )
    m = snapshot_delete_positional(spark, root, "id > 9000")
    assert m["tombstones"][0]["n_keys"] == 5 or len(m["tombstones"]) == 1  # old one carried, no new
    assert snapshot_read(spark, root).count() == 18


def test_compact_zorder_prunes_2d(spark, tmp_path):
    """OPTIMIZE-ZORDER compaction: after snapshot_compact(zorder_by=(a,b))
    the per-file zone maps prune a 2-D box predicate to a small fraction
    of files, where the unclustered layout kept (almost) all of them —
    and the rows are unchanged."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_compact,
        snapshot_scan,
        snapshot_scan_files,
    )

    root = str(tmp_path / "snap")
    n = 20011
    df = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 7919) % n).alias("a"),
        ((F.col("id") * 104729) % n).alias("b"),
    )
    snapshot_commit(df.repartition(8), root)
    box = {"a": (100, 600), "b": (100, 600)}
    before = snapshot_scan_files(root, ranges=box)
    assert before["kept"] == before["kept"] + before["skipped"] == 8  # no pruning
    m = snapshot_compact(spark, root, target_bytes=24 * 1024, zorder_by=("a", "b"))
    assert m["n_files"] >= 8
    after = snapshot_scan_files(root, ranges=box)
    total_after = after["kept"] + after["skipped"]
    assert total_after == m["n_files"]
    assert after["kept"] <= total_after // 2, after
    # correctness unchanged: same rows, and the pruned scan agrees with
    # the unpruned filter
    got = sorted(
        r["id"]
        for r in snapshot_scan(spark, root, ranges=box)
        .where(
            F.col("a").between(100, 600) & F.col("b").between(100, 600)
        )
        .collect()
    )
    expect = sorted(
        i for i in range(n)
        if 100 <= (i * 7919) % n <= 600 and 100 <= (i * 104729) % n <= 600
    )
    assert got == expect


def test_apply_changes_replays_appends_and_deletes(spark, tmp_path):
    """CDC replay: appends, an equality delete, and a positional delete on
    the source replay into an equivalent downstream table; reruns are
    no-ops (high-water stamp) and later source commits apply
    incrementally."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_apply_changes,
        snapshot_delete_mor,
        snapshot_delete_positional,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    snapshot_commit(_df(spark, 0, 10).coalesce(1), src)
    snapshot_commit(_df(spark, 10, 20).coalesce(1), src)
    snapshot_delete_mor(spark, src, "id = 5", key_col="id")
    snapshot_delete_positional(spark, src, "id = 12")
    snapshot_commit(_df(spark, 20, 25).coalesce(1), src)

    def rows(root):
        return sorted((r["id"], r["v"]) for r in snapshot_read(spark, root).collect())

    out = snapshot_apply_changes(spark, src, dst, key_col="id")
    assert out["applied_through"] == 5
    assert out["append_batches"] == 3 and out["delete_batches"] == 2
    assert rows(dst) == rows(src)
    # rerun: nothing new, nothing replayed
    out2 = snapshot_apply_changes(spark, src, dst, key_col="id")
    assert out2 == {
        "applied_through": 5, "append_batches": 0, "delete_batches": 0,
    }
    # incremental: a later append + delete apply as a delta
    snapshot_commit(_df(spark, 25, 30).coalesce(1), src)
    snapshot_delete_mor(spark, src, "id = 27", key_col="id")
    out3 = snapshot_apply_changes(spark, src, dst, key_col="id")
    assert out3["append_batches"] == 1 and out3["delete_batches"] == 1
    assert rows(dst) == rows(src)


def test_commit_retries_rebase_append_without_rewriting_data(spark, tmp_path):
    """Six concurrent appenders with retries= land all six commits with
    exactly six data dirs: a rebase re-publishes the manifest against the
    new head, it never rewrites data files (the old external-retry loop
    re-committed — one orphan dir per lost race)."""
    import threading

    root = str(tmp_path / "snap")
    errors: list[Exception] = []

    def writer(w: int) -> None:
        try:
            df = spark.createDataFrame(
                [(i, w) for i in range(w * 10, w * 10 + 10)],
                "id long, stamp long",
            ).coalesce(1)
            snapshot_commit(df, root, retries=100)
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
    assert snapshot_versions(root) == [1, 2, 3, 4, 5, 6]
    rows = sorted(r["id"] for r in snapshot_read(spark, root).collect())
    assert rows == list(range(60))
    data_dirs = [
        d for d in os.listdir(os.path.join(root, "data"))
        if not d.startswith(("_", "."))
    ]
    assert len(data_dirs) == 6, f"rebase must not rewrite data: {data_dirs}"


def test_commit_retry_rebase_semantics(spark, tmp_path, monkeypatch):
    """Deterministic conflict injection: a winner commit lands between the
    loser's version resolution and publish. Appends with retries rebase
    (inheriting Bloom config the winner enabled, bitsets rebuilt for the
    loser's files); overwrite and retries=0 raise."""
    from airflow_postgres_csv_spark.operators import snapshots as S
    from airflow_postgres_csv_spark.operators.snapshots import (
        SnapshotConflictError,
        snapshot_lookup,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10), root)

    real = S._publish

    def inject_winner():
        fired = {}

        def racy(root_, versions, body, commit_id, sidecar):
            if not fired:
                fired["x"] = True
                # the winner enables a Bloom index the loser never asked for
                snapshot_commit(
                    _df(spark, 100, 110), root, bloom_cols=["id"]
                )
            return real(root_, versions, body, commit_id, sidecar)

        monkeypatch.setattr(S, "_publish", racy)

    inject_winner()
    m = snapshot_commit(_df(spark, 10, 20), root, retries=1)
    monkeypatch.setattr(S, "_publish", real)
    assert m["version"] == 3
    assert sorted(r.id for r in snapshot_read(spark, root).collect()) == sorted(
        list(range(20)) + list(range(100, 110))
    )
    # Bloom config re-inherited from the winner; the rebased commit's own
    # files are probe-able (bitsets rebuilt), so a point lookup still works
    assert m["bloom"] == {"cols": ["id"], "m": 4096, "k": 4}
    assert sorted(r.id for r in snapshot_lookup(spark, root, "id", 15).collect()) == [15]

    inject_winner()
    with pytest.raises(SnapshotConflictError):
        snapshot_commit(_df(spark, 0, 3), root, mode="overwrite", retries=5)
    monkeypatch.setattr(S, "_publish", real)

    inject_winner()
    with pytest.raises(SnapshotConflictError):
        snapshot_commit(_df(spark, 20, 30), root)  # default retries=0

    # ADVICE r6: expected_head + retries — a conflict must RAISE, never
    # rebase onto the moved head (rebasing would silently void the head
    # pin the caller requested; catalog_txn's expect_pinned and
    # compaction rely on it)
    head = snapshot_versions(root)[-1]
    inject_winner()
    with pytest.raises(SnapshotConflictError):
        snapshot_commit(
            _df(spark, 30, 40), root, expected_head=head, retries=5
        )
    monkeypatch.setattr(S, "_publish", real)


def test_apply_changes_replays_merge_compact_and_cow_delete(spark, tmp_path):
    """Batch CDC replay across every rewrite kind: appends, a MOR delete,
    a COW MERGE (update + insert), a compaction (skipped), a COW range
    delete — the downstream table equals the source's live state, and a
    rerun is a no-op."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_apply_changes,
        snapshot_compact,
        snapshot_delete,
        snapshot_delete_mor,
        snapshot_merge,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    snapshot_commit(_df(spark, 0, 10).coalesce(1), src)            # v1
    snapshot_delete_mor(spark, src, "id = 4", key_col="id")        # v2
    updates = spark.createDataFrame([(3, 333), (50, 500)], "id long, v long")
    snapshot_merge(spark, src, updates, "id")                      # v3
    snapshot_compact(spark, src)                                   # v4
    snapshot_delete(spark, src, "id", 6, 8)                        # v5
    snapshot_commit(_df(spark, 60, 62).coalesce(1), src)           # v6
    r = snapshot_apply_changes(spark, src, dst, key_col="id")
    assert r["applied_through"] == 6

    def live(root):
        return sorted((x["id"], x["v"]) for x in snapshot_read(spark, root).collect())

    assert live(dst) == live(src)
    assert (3, 333) in live(dst) and (50, 500) in live(dst)
    assert not any(i in (4, 6, 7, 8) for i, _ in live(dst))
    # rerun: high-water mark makes it a no-op
    before = snapshot_versions(dst)
    r2 = snapshot_apply_changes(spark, src, dst, key_col="id")
    assert r2["append_batches"] == 0 and r2["delete_batches"] == 0
    assert snapshot_versions(dst) == before


def test_as_of_timestamp_and_history(spark, tmp_path):
    """committed_at is stamped strictly increasing; AS-OF-timestamp
    resolves the newest version at or before the instant; DESCRIBE
    HISTORY reports the manifest chain."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_delete_mor,
        snapshot_history,
        snapshot_version_as_of,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10), root)
    snapshot_commit(_df(spark, 10, 15), root)
    snapshot_delete_mor(spark, root, "id = 3", key_col="id")
    h = snapshot_history(root)
    assert [x["version"] for x in h] == [1, 2, 3]
    assert [x["mode"] for x in h] == ["append", "append", "delete-mor"]
    assert [x["n_tombstones"] for x in h] == [0, 0, 1]
    ts = [x["committed_at"] for x in h]
    assert ts[0] < ts[1] < ts[2]
    assert snapshot_version_as_of(root, ts[0]) == 1
    assert snapshot_version_as_of(root, ts[1]) == 2
    assert snapshot_version_as_of(root, ts[2] + 10**12) == 3
    assert snapshot_read(spark, root, as_of=ts[1]).count() == 15
    assert snapshot_read(spark, root, as_of=ts[0]).count() == 10
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        snapshot_version_as_of(root, ts[0] - 1)
    with _pytest.raises(ValueError):
        snapshot_read(spark, root, version=1, as_of=ts[0])


def test_incremental_agg_with_retractions(spark, tmp_path):
    """IVM: the maintained (n, total) per group equals a fresh GROUP BY
    over the source's live state after every refresh — across appends, a
    MOR delete, a COW merge, and a COW range delete — and a refresh with
    nothing new is a no-op."""
    from pyspark.sql import functions as F

    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_delete,
        snapshot_delete_mor,
        snapshot_incremental_agg,
        snapshot_merge,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")

    def grp(spark_df):
        return sorted(
            tuple(r)
            for r in spark_df.groupBy((F.col("id") % 3).alias("g"))
            .agg(F.count("*").cast("long").alias("n"), F.sum("v").alias("total"))
            .collect()
        )

    def maintained():
        return sorted(
            tuple(r)
            for r in snapshot_read(spark, dst)
            .where("n > 0")
            .withColumnRenamed("g", "g")
            .collect()
        )

    # seed: two appends
    snapshot_commit(
        _df(spark, 0, 10).withColumn("g", (F.col("id") % 3)).coalesce(1), src
    )
    snapshot_commit(
        _df(spark, 10, 20).withColumn("g", (F.col("id") % 3)).coalesce(1), src
    )
    snapshot_incremental_agg(spark, src, dst, "g", "v")
    assert maintained() == grp(snapshot_read(spark, src))
    # deletes + merge, incremental refresh only reads the changes
    snapshot_delete_mor(spark, src, "id % 5 = 0", key_col="id")
    updates = spark.createDataFrame(
        [(3, 999, 0), (50, 500, 2)], "id long, v long, g long"
    )
    snapshot_merge(spark, src, updates, "id")
    snapshot_delete(spark, src, "id", 11, 13)
    r = snapshot_incremental_agg(spark, src, dst, "g", "v")
    assert r["refreshed"] is True
    assert maintained() == grp(snapshot_read(spark, src))
    # idempotent: nothing new -> no refresh, no new dst version
    before = snapshot_versions(dst)
    r2 = snapshot_incremental_agg(spark, src, dst, "g", "v")
    assert r2["refreshed"] is False and snapshot_versions(dst) == before


def test_snapshot_update_where(spark, tmp_path):
    """UPDATE ... SET ... WHERE as a keyed COW merge: matching rows get
    their new images, everything else is untouched, and the commit is a
    merge (change feed / CDC replay inherit it for free)."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_table_changes,
        snapshot_update,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10).coalesce(1), root)
    m = snapshot_update(
        spark, root, "id % 3 = 0", {"v": "v * 100 + id"}, key_col="id"
    )
    assert m["mode"] == "merge" and m.get("merge_info")
    rows = {r["id"]: r["v"] for r in snapshot_read(spark, root).collect()}
    for i in range(10):
        assert rows[i] == (i * 2 * 100 + i if i % 3 == 0 else i * 2)
    ch = snapshot_table_changes(spark, root, from_version=1)
    assert sorted(
        (r["id"], r["_change_type"]) for r in ch.collect()
    ) == sorted(
        [(i, "delete") for i in (0, 3, 6, 9)]
        + [(i, "insert") for i in (0, 3, 6, 9)]
    )
    import pytest as _p

    with _p.raises(ValueError, match="key column"):
        snapshot_update(spark, root, "true", {"id": "id + 1"}, key_col="id")
    with _p.raises(ValueError, match="no such column"):
        snapshot_update(spark, root, "true", {"zz": "1"}, key_col="id")


def test_clone_zero_copy_and_independent(spark, tmp_path):
    """snapshot_clone hardlinks the pinned files (shared inodes, zero
    bytes copied) and the clone's history is fully independent: deletes
    and expire on one side never affect the other."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_clone,
        snapshot_delete_mor,
        snapshot_expire,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    snapshot_commit(_df(spark, 0, 10).coalesce(1), src)
    snapshot_delete_mor(spark, src, "id = 9", key_col="id")
    m = snapshot_clone(src, dst)
    assert m["version"] == 1 and m["mode"] == "clone" and m["cloned_from"] == 2
    # zero-copy: every cloned data file shares its inode with the source
    for rel in m["files"]:
        assert os.stat(os.path.join(dst, rel)).st_nlink >= 2
    # tombstones carried: the clone reads the source's live state
    assert snapshot_read(spark, dst).count() == 9
    # independence: delete in the clone, source unchanged...
    snapshot_delete_mor(spark, dst, "id < 5", key_col="id")
    assert snapshot_read(spark, dst).count() == 4
    assert snapshot_read(spark, src).count() == 9
    # ...and source-side expire+append never breaks the clone
    snapshot_commit(_df(spark, 10, 12).coalesce(1), src, mode="overwrite")
    snapshot_expire(src, keep_last=1)
    assert snapshot_read(spark, dst).count() == 4
    # a second clone into a used root is refused
    import pytest as _p

    with _p.raises(FileExistsError):
        snapshot_clone(src, dst)


def test_ivm_stamp_survives_compact_and_expire(spark, tmp_path):
    """The IVM high-water mark is inherited by maintenance commits and
    found by the newest-first stamp scan, so compact+expire on the
    maintained table can never reopen the double-count window."""
    from airflow_postgres_csv_spark.operators import snapshots as S
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_compact,
        snapshot_expire,
        snapshot_incremental_agg,
    )
    from pyspark.sql import functions as F

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    snapshot_commit(
        _df(spark, 0, 12).withColumn("g", F.col("id") % 3).coalesce(1), src
    )
    snapshot_incremental_agg(spark, src, dst, "g", "v")
    snapshot_compact(spark, dst)          # maintenance commit on the VIEW
    snapshot_expire(dst, keep_last=1)     # drops the stamped manifest
    assert S._max_stamp(dst, "ivm_applied_version", 0) == 1
    r = snapshot_incremental_agg(spark, src, dst, "g", "v")
    assert r["refreshed"] is False  # would double-count if the stamp died
    rows = sorted(tuple(x) for x in snapshot_read(spark, dst).collect())
    assert rows == [(0, 4, 36), (1, 4, 44), (2, 4, 52)]


@pytest.mark.slow
def test_incremental_agg_general_multikey_minmax_avg(spark, tmp_path):
    """Generalized IVM: multi-column group keys merge on a derived
    composite key; count/sum/avg/min/max all stay exact across appends
    AND retractions — a delete that holds a group's MINIMUM displaces
    it, which is resolved by recomputing extremes for exactly the
    retracting groups (never a full recompute); AVG derives from the
    stored (total, nn) so NULL amounts divide by the non-null count."""
    from pyspark.sql import functions as F

    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_delete_mor,
        snapshot_incremental_agg,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    aggs = ("count", "sum", "avg", "min", "max")

    def rows(lo, hi):
        return spark.range(lo, hi).select(
            "id",
            (F.col("id") % 3).alias("g"),
            (F.col("id") % 2).alias("h"),
            F.when(F.col("id") % 5 == 0, None)
            .otherwise(F.col("id") * 3).alias("amt"),
        )

    def truth():
        return sorted(
            tuple(r)
            for r in snapshot_read(spark, src)
            .groupBy("g", "h")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("amt").alias("total"),
                F.avg("amt").alias("avg"),
                F.min("amt").alias("mn"),
                F.max("amt").alias("mx"),
            )
            .collect()
        )

    def maintained():
        out = snapshot_read(spark, dst).where("n > 0")
        return sorted(
            (r.g, r.h, r.n, r.total,
             (r.total / r.nn) if r.nn else None, r.mn, r.mx)
            for r in out.collect()
        )

    snapshot_commit(rows(0, 30).coalesce(1), src)
    r = snapshot_incremental_agg(spark, src, dst, ["g", "h"], "amt", aggs=aggs)
    assert r["refreshed"] is True
    assert maintained() == truth()
    # a retraction that DELETES group minima (small ids = small amts)
    snapshot_delete_mor(spark, src, "id < 12", key_col="id")
    snapshot_incremental_agg(spark, src, dst, ["g", "h"], "amt", aggs=aggs)
    assert maintained() == truth()
    # insert-only advance: extremes merge without touching the source
    snapshot_commit(rows(30, 50).coalesce(1), src)
    snapshot_incremental_agg(spark, src, dst, ["g", "h"], "amt", aggs=aggs)
    assert maintained() == truth()
    # empty a whole group-pair and verify it vanishes from the surface
    snapshot_delete_mor(spark, src, "g = 2 AND h = 0", key_col="id")
    snapshot_incremental_agg(spark, src, dst, ["g", "h"], "amt", aggs=aggs)
    assert maintained() == truth()
    assert all(t[0:2] != (2, 0) for t in maintained())
    # idempotent on the high-water mark
    before = snapshot_versions(dst)
    r2 = snapshot_incremental_agg(spark, src, dst, ["g", "h"], "amt", aggs=aggs)
    assert r2["refreshed"] is False and snapshot_versions(dst) == before
    # validation: unknown aggregate names are refused loudly
    with pytest.raises(ValueError, match="aggs"):
        snapshot_incremental_agg(
            spark, src, dst, ["g", "h"], "amt", aggs=("count", "median")
        )


def test_undelete_rollback_fails_change_walkers(spark, tmp_path):
    """A rollback that resurrects MOR-deleted rows (tombstones removed,
    files unchanged) must fail the batch change feed and CDC replay
    loudly — silence would leave keyed mirrors permanently diverged."""
    import pytest

    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_apply_changes,
        snapshot_delete_mor,
        snapshot_rollback,
        snapshot_table_changes,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10).coalesce(1), root)
    snapshot_delete_mor(spark, root, "id = 3", key_col="id")
    snapshot_rollback(spark, root, 1)  # un-delete: files same, tombstones gone
    with pytest.raises(ValueError, match="un-delete"):
        snapshot_table_changes(spark, root).collect()
    with pytest.raises(ValueError, match="un-delete"):
        snapshot_apply_changes(
            spark, root, str(tmp_path / "dst"), key_col="id"
        )


def test_compact_race_raises_instead_of_dropping_commit(spark, tmp_path):
    """A commit interleaving between compaction's read and publish must
    raise SnapshotConflictError — never silently vanish under the
    compacted overwrite."""
    import pytest

    from airflow_postgres_csv_spark.operators import snapshots as S
    from airflow_postgres_csv_spark.operators.snapshots import (
        SnapshotConflictError,
        snapshot_compact,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10).coalesce(1), root)
    real_read = S.snapshot_read
    fired = {}

    def racy_read(spark_, root_, **kw):
        if not fired:
            fired["x"] = True
            snapshot_commit(_df(spark, 10, 15).coalesce(1), root)  # interloper
        return real_read(spark_, root_, **kw)

    S.snapshot_read = racy_read
    try:
        with pytest.raises(SnapshotConflictError):
            snapshot_compact(spark, root)
    finally:
        S.snapshot_read = real_read
    # the interleaved commit survived
    assert snapshot_read(spark, root).count() == 15


def test_mor_delete_scope_pinned_against_concurrent_append(spark, tmp_path):
    """_publish_key_tombstone refuses to publish against a moved head:
    otherwise a concurrently appended re-insert of the deleted key would
    be swept into the tombstone's commit scope and deleted."""
    import pytest

    from airflow_postgres_csv_spark.operators import snapshots as S
    from airflow_postgres_csv_spark.operators.snapshots import (
        SnapshotConflictError,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(_df(spark, 0, 10).coalesce(1), root)
    keys = spark.createDataFrame([(3,)], "id long")
    snapshot_commit(_df(spark, 10, 12).coalesce(1), root)  # head moves to 2
    with pytest.raises(SnapshotConflictError, match="head moved"):
        S._publish_key_tombstone(root, keys, "id", "id = 3", as_of_version=1)


def test_root_manifest_is_o_commits_not_o_files(spark, tmp_path):
    """The on-disk root manifest's byte size must be independent of how
    many data FILES each commit wrote: per-commit file lists live in the
    immutable sidecars, the root carries only int markers (VERDICT r6
    item 2 — at 100 TB / ~10^6 files the old O(paths) root was ~100 MB of
    driver-side JSON parsed by EVERY read)."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        _manifest_path,
    )

    ra, rb = str(tmp_path / "few"), str(tmp_path / "many")
    for root, nfiles in ((ra, 1), (rb, 64)):
        for lo in (0, 1000):
            snapshot_commit(
                spark.range(lo, lo + 2000).select(
                    "id", (F.col("id") * 2).alias("v")
                ).repartition(nfiles),
                root,
            )
    sa = os.path.getsize(_manifest_path(ra, 2))
    sb = os.path.getsize(_manifest_path(rb, 2))
    assert abs(sa - sb) < 64, (sa, sb)  # 64x the files, same root size
    # and the manifests still materialize the full pinned lists
    from airflow_postgres_csv_spark.operators.snapshots import _load_manifest

    m = _load_manifest(rb, 2)
    assert m["n_files"] == 128 and len(m["files"]) == 128
    assert snapshot_read(spark, rb).count() == 4000


def test_fully_pruned_commit_never_opens_its_sidecar(spark, tmp_path, monkeypatch):
    """Commit-level pruning must answer from the root manifest ALONE: a
    commit whose commit-level range is disjoint from the predicate gets
    neither its sidecar opened nor its file names enumerated."""
    import builtins

    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_scan,
        snapshot_scan_files,
    )

    root = str(tmp_path / "snap")
    # three commits range-clustered on id: [0,100), [100,200), [200,300)
    for lo in (0, 100, 200):
        snapshot_commit(
            spark.range(lo, lo + 100).select(
                "id", (F.col("id") * 2).alias("v")
            ).repartition(4),
            root,
            partition_by=["id"],
        )
    plan = snapshot_scan_files(root, "id", 250, 260)
    assert plan["commits_skipped"] == 2 and plan["sidecars_loaded"] == 1

    opened: list[str] = []
    real_open = builtins.open

    def spying_open(path, *a, **kw):
        if isinstance(path, (str, os.PathLike)) and "sc-" in str(path):
            opened.append(str(path))
        return real_open(path, *a, **kw)

    from airflow_postgres_csv_spark.operators.snapshots import (
        _metadata_cache_clear,
    )

    _metadata_cache_clear()  # cold cache: opens below are real file I/O
    monkeypatch.setattr(builtins, "open", spying_open)
    df = snapshot_scan(spark, root, "id", 250, 260)
    monkeypatch.setattr(builtins, "open", real_open)
    assert len(set(opened)) == 1, opened  # ONLY the surviving commit's
    assert df.count() == 11


def test_sidecar_opens_memoized_within_session(spark, tmp_path, monkeypatch):
    """Sidecar-open-count pin (VERDICT r7 item 2): a query pattern that
    loads the manifest repeatedly (read + history + changes + a second
    read, as the snapshot pipeline queries do) must open each commit
    sidecar AT MOST ONCE per session — sidecars are immutable, so the
    session memo absorbs every repeat materialization. This is the
    structural metric for the metadata path: swings in wall-clock on the
    snapshot queries are attributable iff this count moves."""
    import builtins

    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        _metadata_cache_clear,
        snapshot_table_changes,
    )

    root = str(tmp_path / "snap")
    for lo in (0, 100, 200):
        snapshot_commit(
            spark.range(lo, lo + 100).select(
                "id", (F.col("id") * 2).alias("v")
            ).repartition(4),
            root,
        )

    opened: list[str] = []
    real_open = builtins.open

    def spying_open(path, *a, **kw):
        if isinstance(path, (str, os.PathLike)) and "sc-" in str(path):
            opened.append(str(path))
        return real_open(path, *a, **kw)

    _metadata_cache_clear()
    monkeypatch.setattr(builtins, "open", spying_open)
    assert snapshot_read(spark, root).count() == 300
    _ = _load_manifest(root, 3)["files"]  # a second full materialization
    snapshot_table_changes(spark, root, 1, 3).count()
    assert snapshot_read(spark, root, version=2).count() == 200
    monkeypatch.setattr(builtins, "open", real_open)
    # 3 commits referenced; each sidecar parsed from disk at most once
    assert len(opened) == len(set(opened)) == 3, opened

    # and a fully warmed session re-plans with ZERO metadata file I/O
    opened.clear()
    monkeypatch.setattr(builtins, "open", spying_open)
    _ = _load_manifest(root, 3)["files"]
    monkeypatch.setattr(builtins, "open", real_open)
    assert opened == [], opened


def test_files_diff_is_o_changed_commits(spark, tmp_path, monkeypatch):
    """snapshot_files_diff answers an append step from markers alone:
    untouched commits' sidecars are never opened — the per-micro-batch
    planning cost of a long-lived stream must not grow with table size."""
    import builtins

    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_delete,
        snapshot_files_diff,
    )

    root = str(tmp_path / "snap")
    for lo in (0, 100, 200, 300):
        snapshot_commit(
            spark.range(lo, lo + 100).select(
                "id", (F.col("id") * 2).alias("v")
            ).repartition(4),
            root,
        )
    m3, m4 = _load_manifest(root, 3), _load_manifest(root, 4)

    opened: list[str] = []
    real_open = builtins.open

    def spying_open(path, *a, **kw):
        if isinstance(path, (str, os.PathLike)) and "sc-" in str(path):
            opened.append(str(path))
        return real_open(path, *a, **kw)

    from airflow_postgres_csv_spark.operators.snapshots import (
        _metadata_cache_clear,
    )

    _metadata_cache_clear()  # cold cache: opens below are real file I/O
    monkeypatch.setattr(builtins, "open", spying_open)
    added, removed = snapshot_files_diff(root, m3, m4)
    monkeypatch.setattr(builtins, "open", real_open)
    assert len(added) == 4 and removed == []
    assert len(set(opened)) == 1, opened  # ONLY the new commit's sidecar
    assert {f.split(os.sep)[1] for f in added} == {
        _load_manifest(root, 4)["commit_id"]
    }

    # a COW partial rewrite: removed = the replaced files, added = the
    # rewrite's files; untouched commits still contribute nothing
    snapshot_delete(spark, root, "id", 150, 160)
    m5 = _load_manifest(root, 5)
    added2, removed2 = snapshot_files_diff(root, m4, m5)
    assert removed2 and added2
    assert all(f in m4["files"] for f in removed2)
    assert all(f in m5["files"] for f in added2)
    # parity with the full set diff on every adjacent pair
    for lo_v, hi_v in ((1, 2), (2, 3), (3, 4), (4, 5)):
        a, b = _load_manifest(root, lo_v), _load_manifest(root, hi_v)
        want_a = sorted(set(b["files"]) - set(a["files"]))
        want_r = sorted(set(a["files"]) - set(b["files"]))
        assert snapshot_files_diff(root, a, b) == (want_a, want_r)


def test_merge_into_full_clause_surface(spark, tmp_path):
    """MERGE INTO with DELETE / conditional UPDATE / conditional INSERT:
    exact row semantics, file-granular rewrite, no-op short-circuit, and
    a change feed that replays update (pre+post), delete (pre only) and
    insert (post only) — then apply_changes converges a downstream copy,
    including the merge-deleted keys."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_apply_changes,
        snapshot_merge_into,
        snapshot_table_changes,
    )

    root = str(tmp_path / "t")
    target = spark.createDataFrame(
        [(i, i * 10, "old") for i in range(10)], "id long, v long, tag string"
    )
    snapshot_commit(target.coalesce(2), root)
    # source: ids 0..4 matched (0,1 delete; 2,3 update; 4 untouched by
    # conditions), ids 10,11 unmatched (10 inserted, 11 filtered out)
    source = spark.createDataFrame(
        [(0, 0, "x"), (1, 0, "x"), (2, 7, "upd"), (3, 7, "upd"),
         (4, 7, "skip"), (10, 100, "new"), (11, 100, "skip")],
        "id long, v long, tag string",
    )
    m = snapshot_merge_into(
        spark, root, source, key="id",
        matched_update={"v": "t.v + s.v", "tag": "s.tag"},
        matched_update_condition="s.tag = 'upd'",
        matched_delete_condition="s.v = 0",
        not_matched_condition="s.tag = 'new'",
    )
    assert m["mode"] == "merge" and m["version"] == 2
    got = {r.id: (r.v, r.tag) for r in snapshot_read(spark, root).collect()}
    assert 0 not in got and 1 not in got          # WHEN MATCHED DELETE
    assert got[2] == (27, "upd")                  # UPDATE SET expr over t+s
    assert got[3] == (37, "upd")
    assert got[4] == (40, "old")                  # matched, no clause fired
    assert got[10] == (100, "new")                # conditional INSERT
    assert 11 not in got                          # insert condition filtered
    assert all(got[i] == (i * 10, "old") for i in (5, 6, 7, 8, 9))

    # change feed replay shape: per-key (pre, post) pairs
    ch = snapshot_table_changes(spark, root, 1, 2)
    by_key = {}
    for r in ch.collect():
        by_key.setdefault(r.id, set()).add(r._change_type)
    assert by_key[0] == {"delete"} and by_key[1] == {"delete"}
    assert by_key[2] == {"delete", "insert"}      # update = pre + post
    assert by_key[10] == {"insert"}
    assert 4 not in by_key and 5 not in by_key    # untouched keys: silent

    # downstream convergence incl. the deleted keys
    dst = str(tmp_path / "dst")
    snapshot_apply_changes(spark, root, dst, key_col="id", from_version=0)
    want = sorted((r.id, r.v, r.tag) for r in snapshot_read(spark, root).collect())
    have = sorted((r.id, r.v, r.tag) for r in snapshot_read(spark, dst).collect())
    assert have == want

    # a merge whose clauses change nothing publishes a metadata no-op
    noop_src = spark.createDataFrame(
        [(5, 0, "zzz")], "id long, v long, tag string"
    )
    m3 = snapshot_merge_into(
        spark, root, noop_src, key="id",
        matched_update={"tag": "s.tag"}, matched_update_condition="s.tag = 'upd'",
        matched_delete_condition="s.v = 99",
        not_matched_condition="s.tag = 'new'",
    )
    assert m3["version"] == 3 and m3["files"] == m["files"]

    # validation: bad column / key update / schema drift raise
    with pytest.raises(ValueError, match="no such column"):
        snapshot_merge_into(spark, root, source, "id", matched_update={"zz": "1"})
    with pytest.raises(ValueError, match="merge key"):
        snapshot_merge_into(spark, root, source, "id", matched_update={"id": "1"})
    with pytest.raises(ValueError, match="schema"):
        snapshot_merge_into(
            spark, root, source.drop("tag"), "id", matched_update={"v": "s.v"}
        )


def test_merge_into_not_matched_by_source_delete(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE: sync-to-source — target
    rows absent from the source are dropped (condition-scoped), and the
    change feed + apply_changes replay them as deletes downstream."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_apply_changes,
        snapshot_merge_into,
    )

    root = str(tmp_path / "t")
    snapshot_commit(
        spark.createDataFrame(
            [(i, i * 10) for i in range(10)], "id long, v long"
        ).coalesce(2),
        root,
    )
    # source keeps 0..4 (3 gets an update), rows 5..9 are not in source:
    # the by-source clause deletes only the even ones among them
    source = spark.createDataFrame(
        [(i, i * 10 if i != 3 else 999) for i in range(5)], "id long, v long"
    )
    snapshot_merge_into(
        spark, root, source, key="id",
        matched_update={"v": "s.v"}, matched_update_condition="s.v <> t.v",
        insert_when_not_matched=False,
        not_matched_by_source_delete="t.id % 2 = 0",
    )
    got = {r.id: r.v for r in snapshot_read(spark, root).collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 999, 4: 40, 5: 50, 7: 70, 9: 90}
    # downstream replica converges, including the by-source deletes
    dst = str(tmp_path / "dst")
    snapshot_apply_changes(spark, root, dst, key_col="id", from_version=0)
    have = {r.id: r.v for r in snapshot_read(spark, dst).collect()}
    assert have == got
    # unconditional sync: everything not in source goes
    snapshot_merge_into(
        spark, root, source, key="id",
        insert_when_not_matched=False,
        not_matched_by_source_delete="true",
    )
    assert sorted(r.id for r in snapshot_read(spark, root).collect()) == [
        0, 1, 2, 3, 4,
    ]


def test_merge_into_duplicate_source_keys_raise(spark, tmp_path):
    """SQL MERGE raises when a target row matches multiple source rows;
    the guard rides the planner's existing min/max aggregate and rejects
    any duplicated non-null source key up front (VERDICT r7 item 6)."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_merge_into,
    )

    root = str(tmp_path / "t")
    snapshot_commit(
        spark.createDataFrame([(i, i) for i in range(5)], "id long, v long"),
        root,
    )
    dup = spark.createDataFrame(
        [(1, 10), (1, 20), (7, 70)], "id long, v long"
    )
    with pytest.raises(ValueError, match="duplicate"):
        snapshot_merge_into(
            spark, root, dup, key="id", matched_update={"v": "s.v"}
        )
    assert len(snapshot_versions(root)) == 1  # nothing published


def test_merge_into_schema_evolution(spark, tmp_path):
    """merge_schema=True evolves adds/widens THROUGH the merge (VERDICT
    r7 item 5): a source with an added column and a widened column
    merges; pre-evolution rows read the new column as NULL; time travel
    to the old version keeps the old schema; and the change feed +
    apply_changes replay exactly across the evolution."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_apply_changes,
        snapshot_merge_into,
        snapshot_table_changes,
    )

    root = str(tmp_path / "t")
    snapshot_commit(
        spark.createDataFrame(
            [(i, i * 10, "old") for i in range(6)],
            "id long, v int, tag string",
        ).coalesce(2),
        root,
    )
    # source: widens v (int -> long), appends score (new column)
    source = spark.createDataFrame(
        [(2, 7, "upd", 0.5), (3, 7, "upd", 1.5), (10, 100, "new", 9.9)],
        "id long, v long, tag string, score double",
    )
    # without the opt-in, drift still raises
    with pytest.raises(ValueError, match="merge_schema"):
        snapshot_merge_into(
            spark, root, source, key="id", matched_update={"v": "t.v + s.v"}
        )
    m = snapshot_merge_into(
        spark, root, source, key="id",
        matched_update={"v": "t.v + s.v", "score": "s.score"},
        merge_schema=True,
    )
    assert m["version"] == 2
    got = {
        r.id: (r.v, r.tag, r.score)
        for r in snapshot_read(spark, root).collect()
    }
    # updated rows carry the widened sum and the new column
    assert got[2] == (27, "old", 0.5) and got[3] == (37, "old", 1.5)
    assert got[10] == (100, "new", 9.9)
    # untouched pre-evolution rows read score as NULL
    assert got[0] == (0, "old", None) and got[5] == (50, "old", None)
    sch = dict(snapshot_read(spark, root).dtypes)
    assert sch["v"] == "bigint" and sch["score"] == "double"
    # time travel: version 1 keeps its original 3-column int schema
    old = snapshot_read(spark, root, version=1)
    assert dict(old.dtypes) == {"id": "bigint", "v": "int", "tag": "string"}

    # change feed replays exactly across the evolution: update pairs for
    # 2,3 / insert for 10; pre-images have no score (null-filled)
    ch = snapshot_table_changes(spark, root, 1, 2)
    by = {}
    for r in ch.collect():
        by.setdefault(r.id, set()).add((r._change_type, r.score))
    assert by[2] == {("delete", None), ("insert", 0.5)}
    assert by[3] == {("delete", None), ("insert", 1.5)}
    assert by[10] == {("insert", 9.9)}
    assert 0 not in by and 5 not in by
    dst = str(tmp_path / "dst")
    snapshot_apply_changes(spark, root, dst, key_col="id", from_version=0)
    want = sorted(
        (r.id, r.v, r.tag, r.score)
        for r in snapshot_read(spark, root).collect()
    )
    have = sorted(
        (r.id, r.v, r.tag, r.score)
        for r in snapshot_read(spark, dst).collect()
    )
    assert have == want

    # unsafe conflicts still raise under the opt-in
    bad = spark.createDataFrame([(1, "x")], "id long, v string")
    with pytest.raises(ValueError, match="cannot evolve"):
        snapshot_merge_into(
            spark, root, bad, key="id", matched_update=None,
            merge_schema=True,
        )


def test_hilbert_value_matches_reference_and_is_adjacent(spark):
    """hilbert_value is the standard xy->d Hilbert index: bijective on the
    grid, equal to the textbook Python fold, and consecutive d values are
    grid NEIGHBORS (the locality property Morton lacks — Morton jumps
    quadrant diagonals)."""
    from airflow_postgres_csv_spark.operators.layout import hilbert_value

    def ref_xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    bits, n = 4, 16
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    got = {
        (r.x, r.y): r.d
        for r in grid.select(
            "x", "y", hilbert_value(F.col("x"), F.col("y"), bits=bits).alias("d")
        ).collect()
    }
    want = {(x, y): ref_xy2d(n, x, y) for x in range(n) for y in range(n)}
    assert got == want
    # bijective: every d in [0, n^2) exactly once
    assert sorted(got.values()) == list(range(n * n))
    # adjacency: consecutive curve positions are Manhattan-distance-1
    by_d = {d: xy for xy, d in got.items()}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])


def test_compact_hilbert_prunes_2d(spark, tmp_path):
    """OPTIMIZE with curve='hilbert': a 2-D box scan on the re-clustered
    table skips files — and at least as many as the pre-compaction layout
    allowed (the same payoff contract as the Morton pin)."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_compact,
        snapshot_scan,
        snapshot_scan_files,
    )

    root = str(tmp_path / "snap")
    n = 40_000
    df = spark.range(n).select(
        (F.col("id") % 200).alias("x"),
        (F.col("id") / 200).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    snapshot_commit(df.repartition(8), root)
    m = snapshot_compact(
        spark, root, target_bytes=48 * 1024, zorder_by=("x", "y"),
        curve="hilbert",
    )
    assert m["n_files"] > 4  # enough files for skipping to mean anything
    box = {"x": (10, 40), "y": (10, 40)}
    plan = snapshot_scan_files(root, ranges=box)
    assert plan["skipped"] > 0, plan
    assert plan["kept"] < m["n_files"], plan
    got = snapshot_scan(spark, root, ranges=box).where(
        F.col("x").between(10, 40) & F.col("y").between(10, 40)
    )
    assert got.count() == 31 * 31
    with pytest.raises(ValueError, match="morton|hilbert"):
        snapshot_compact(spark, root, zorder_by=("x", "y"), curve="peano")


def _ref_hilbert_nd(coords, bits):
    """Skilling, "Programming the Hilbert curve" (AIP Conf. Proc. 707,
    2004): AxesToTranspose + bit interleave of the transposed index."""
    X = list(coords)
    n = len(X)
    M = 1 << (bits - 1)
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(n):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    Q = M
    while Q > 1:
        if X[n - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    d = 0
    for j in range(bits):
        for i in range(n):
            d |= (((X[i] ^ t) >> j) & 1) << (j * n + (n - 1 - i))
    return d


def test_hilbert_nd_matches_reference_and_is_adjacent(spark):
    """hilbert_value generalizes beyond 2 columns (VERDICT r7 item 4):
    the n-D fold equals the textbook Skilling transform, is bijective on
    the grid, and keeps the defining Hilbert property — consecutive curve
    positions are L1-distance-1 grid neighbors — in 3 and 4 dimensions.
    N-ary zorder_value equals the plain Morton interleave."""
    from airflow_postgres_csv_spark.operators.layout import (
        hilbert_value,
        max_curve_bits,
        zorder_value,
    )

    for n_dim, bits in ((3, 2), (4, 2)):
        side = 1 << bits
        import itertools

        coords = list(itertools.product(range(side), repeat=n_dim))
        names = [f"c{i}" for i in range(n_dim)]
        df = spark.createDataFrame(
            coords, ", ".join(f"{c} long" for c in names)
        )
        got = {
            tuple(r[:n_dim]): r.d
            for r in df.select(
                *names,
                hilbert_value(*[F.col(c) for c in names], bits=bits).alias("d"),
            ).collect()
        }
        assert got == {c: _ref_hilbert_nd(c, bits) for c in coords}
        assert sorted(got.values()) == list(range(side**n_dim))
        by_d = {d: c for c, d in got.items()}
        for d in range(side**n_dim - 1):
            a, b = by_d[d], by_d[d + 1]
            assert sum(abs(x - y) for x, y in zip(a, b)) == 1, (n_dim, d, a, b)

    # n-ary Morton: bit i of column j lands at n*i + j
    rows = [(5, 9, 3), (1023, 0, 512), (7, 7, 7)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = [
        r.d
        for r in df.select(
            zorder_value(F.col("x"), F.col("y"), F.col("z"), bits=10).alias("d")
        ).collect()
    ]
    want = []
    for c in rows:
        d = 0
        for i in range(10):
            for j in range(3):
                d |= ((c[j] >> i) & 1) << (3 * i + j)
        want.append(d)
    assert got == want
    # long-overflow guard: n*bits must fit a signed long
    assert max_curve_bits(3) == 21 and max_curve_bits(4) == 15
    with pytest.raises(ValueError, match="63"):
        zorder_value(F.col("x"), F.col("y"), F.col("z"), bits=22)
    with pytest.raises(ValueError, match=">= 2 columns"):
        hilbert_value(F.col("x"))


def test_compact_zorder3_prunes_3d(spark, tmp_path):
    """OPTIMIZE on THREE columns: a 3-D box scan on the curve-clustered
    rewrite skips more files than a 1-D-sorted layout of the same data
    (the n-column payoff pin mirroring the 2-D one), for both curves."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_compact,
        snapshot_scan,
        snapshot_scan_files,
    )

    n = 32_768
    df = spark.range(n).select(
        (F.col("id") % 32).alias("x"),
        (F.floor(F.col("id") / 32) % 32).alias("y"),
        F.floor(F.col("id") / 1024).alias("z"),
        F.col("id").alias("payload"),
    )
    n_linear = 32
    lroot = str(tmp_path / "linear")
    snapshot_commit(
        df.repartitionByRange(n_linear, "x").sortWithinPartitions("x"), lroot
    )
    box = {"x": (0, 7), "y": (0, 7), "z": (0, 7)}  # 1/64 of the 32^3 grid
    lplan = snapshot_scan_files(lroot, ranges=box)
    # x-sorted slabs prune ONLY on x: the box spans 1/4 of x, so ~1/4 kept
    l_frac = lplan["kept"] / n_linear
    want_rows = {
        (x, y, z) for x in range(8) for y in range(8) for z in range(8)
    }
    for curve in ("morton", "hilbert"):
        root = str(tmp_path / curve)
        snapshot_commit(df.repartition(8), root)
        m = snapshot_compact(
            spark, root, target_bytes=6 * 1024,
            zorder_by=("x", "y", "z"), curve=curve,
        )
        assert m["n_files"] >= 16, m["n_files"]
        plan = snapshot_scan_files(root, ranges=box)
        # the 3-D clustered layout keeps a strictly smaller FRACTION of
        # its files than the 1-D sort — the n-column pruning payoff
        assert plan["kept"] / m["n_files"] < l_frac, (curve, plan, lplan)
        assert plan["skipped"] > 0, (curve, plan)
        got = snapshot_scan(spark, root, ranges=box).where(
            F.col("x").between(0, 7)
            & F.col("y").between(0, 7)
            & F.col("z").between(0, 7)
        )
        assert {(r.x, r.y, r.z) for r in got.collect()} == want_rows


def test_manifest_commit_count_hygiene_at_10k_commits(spark, tmp_path):
    """VERDICT r7 item 7: with the root O(commits), commit COUNT is the
    next unbounded axis for a long-lived streaming table. Pins at 10^4
    commits: bytes/commit stays small (per-commit schema copies are
    ELIDED when equal to the table schema — without that the root
    carries 10^4 identical schema strings), the root parses fast, and a
    range scan plans by skipping whole commits from the root alone
    (bounded sidecar opens). Compaction (real, smaller table) collapses
    the markers back to ONE commit and the root size returns to O(1)."""
    import json as _json
    import time as _time

    from airflow_postgres_csv_spark.operators import snapshots as S

    # --- (a) synthetic 10^4-commit root, shaped exactly like _publish's
    # output for an append-per-micro-batch streaming table -------------
    root = str(tmp_path / "many")
    seed = snapshot_commit(
        spark.range(10).select("id", (F.col("id") * 2).alias("v")).coalesce(1),
        root,
    )
    schema_json = seed["schema"]
    n = 10_000
    commit_files: dict = dict(S._load_manifest(root, 1)["commit_files"])
    sidecars = dict(S._load_manifest(root, 1)["sidecars"])
    commit_ranges = dict(S._load_manifest(root, 1)["commit_ranges"])
    commit_sizes = dict(S._load_manifest(root, 1).get("commit_sizes") or {})
    for i in range(n):
        cid = f"syn{i:08x}"
        rel = os.path.join("data", cid, "part-0.parquet")
        sc_rel = os.path.join("manifests", f"sc-{cid}.json")
        with open(os.path.join(root, sc_rel), "w") as f:
            _json.dump(
                {"stats": {rel: {"id": [i, i]}}, "files": [rel],
                 "bytes": {rel: 131072 + i}},
                f,
            )
        commit_files[cid] = 1
        sidecars[cid] = sc_rel
        commit_ranges[cid] = {"id": [i, i]}
        commit_sizes[cid] = [1, 131072 + i, 1]
    manifest = {
        "version": 2, "parent": 1,
        "committed_at": S._load_manifest(root, 1)["committed_at"] + 1,
        "mode": "append", "commit_id": "syn0000270f",
        "n_files": seed["n_files"] + n, "schema": schema_json,
        "commit_schemas": {},  # all commits share the table schema
        "sidecars": sidecars, "commit_ranges": commit_ranges,
        "tombstones": [], "commit_files": commit_files,
        "commit_sizes": commit_sizes,
        "small_bytes": S._SMALL_FILE_BYTES, "sketch_commits": [],
    }
    with open(S._manifest_path(root, 2), "w") as f:
        _json.dump(manifest, f)

    size = os.path.getsize(S._manifest_path(root, 2))
    assert size / n < 150, f"{size / n:.0f} bytes/commit — root too fat"
    t0 = _time.time()
    m = S._load_manifest(root, 2)
    parse_s = _time.time() - t0
    assert parse_s < 2.0, f"root parse took {parse_s:.2f}s at {n} commits"
    t0 = _time.time()
    plan = S.snapshot_scan_files(root, ranges={"id": (5, 9)})
    plan_s = _time.time() - t0
    # commit-level ranges answer the skip from the root alone: at most a
    # handful of sidecars opened out of 10^4
    assert plan["commits_skipped"] >= n - 5, plan
    assert plan["sidecars_loaded"] <= 6, plan  # 5 in-range + seed
    assert plan_s < 2.0, f"scan planning took {plan_s:.2f}s at {n} commits"
    # the maintenance advisor answers from the same root at the same
    # O(commits) bound: 10^4 commits, zero sidecar opens, no stat calls
    from airflow_postgres_csv_spark.operators import maintenance as M

    S._metadata_cache_clear()
    orig_getsize, orig_sidecar = M.os.path.getsize, M._load_sidecar
    M.os.path.getsize = lambda p: (_ for _ in ()).throw(
        AssertionError(f"getsize({p}) at 10^4 commits")
    )
    M._load_sidecar = lambda *a: (_ for _ in ()).throw(
        AssertionError("sidecar open at 10^4 commits")
    )
    try:
        t0 = _time.time()
        advise = M.snapshot_maintenance_plan(root)
        advise_s = _time.time() - t0
    finally:
        M.os.path.getsize, M._load_sidecar = orig_getsize, orig_sidecar
    assert advise["metrics"]["n_files"] == n + seed["n_files"], advise
    assert advise_s < 2.0, f"advisor took {advise_s:.2f}s at {n} commits"

    # --- (b) real table: compaction folds markers + root returns O(1) -
    root2 = str(tmp_path / "fold")
    for i in range(40):
        snapshot_commit(
            spark.range(i * 10, (i + 1) * 10).select(
                "id", (F.col("id") * 2).alias("v")
            ).coalesce(1),
            root2,
        )
    m_before = S._load_manifest(root2, 40)
    assert len(m_before["commit_files"]) == 40
    # schema elision: 40 same-schema commits store ZERO schema copies
    assert m_before["commit_schemas"] == {}
    size_before = os.path.getsize(S._manifest_path(root2, 40))
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_compact

    m_after = snapshot_compact(spark, root2, target_bytes=1 << 30)
    assert len(m_after["commit_files"]) == 1, "compaction must fold markers"
    size_after = os.path.getsize(S._manifest_path(root2, m_after["version"]))
    assert size_after < size_before / 5, (size_before, size_after)
    got = sorted(r.id for r in snapshot_read(spark, root2).collect())
    assert got == list(range(400))


def test_schema_elision_survives_evolution(spark, tmp_path):
    """The storage elision (absent commit_schemas entry == table schema)
    must re-materialize when a commit EVOLVES the schema: older commits
    get explicit entries pinned to the schema they were written under,
    and mixed-schema reads stay exact."""
    from airflow_postgres_csv_spark.operators import snapshots as S

    root = str(tmp_path / "t")
    snapshot_commit(spark.range(5).select("id"), root)
    snapshot_commit(spark.range(5, 10).select("id"), root)
    assert S._load_manifest(root, 2)["commit_schemas"] == {}
    # evolution commit: adds a column
    snapshot_commit(
        spark.range(10, 15).select("id", F.lit(7).cast("long").alias("v")),
        root,
        allow_schema_change=True,
    )
    m = S._load_manifest(root, 3)
    # the two pre-evolution commits are now EXPLICITLY pinned to the old
    # 1-column schema; the new commit's entry (== table schema) elides
    old_cids = {S._commit_of(r) for r in S._load_manifest(root, 2)["files"]}
    assert set(m["commit_schemas"]) == old_cids
    rows = {(r.id, r.v) for r in snapshot_read(spark, root).collect()}
    assert rows == {(i, None) for i in range(10)} | {(i, 7) for i in range(10, 15)}
    # time travel: old version still reads under its own schema
    assert dict(snapshot_read(spark, root, version=2).dtypes) == {"id": "bigint"}


def test_optimize_incremental_clusters_only_new_files(spark, tmp_path):
    """Incremental OPTIMIZE (liquid-clustering cadence): only files added
    since the last optimize are rewritten — previously-optimized files
    are inherited BY POINTER (same rel paths) — tombstones on the
    unoptimized tail fold in, the publish is a verified row-preserving
    compaction (feeds skip it), and an all-optimized table is a no-op."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_delete_mor,
        snapshot_optimize_incremental,
        snapshot_scan_files,
        snapshot_table_changes,
    )

    root = str(tmp_path / "t")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 64).alias("x"),
            (F.floor(F.col("id") / 64) % 64).alias("y"),
            F.col("id").alias("payload"),
        )

    for k in range(3):
        snapshot_commit(batch(k * 1000, (k + 1) * 1000).coalesce(2), root)
    m1 = snapshot_optimize_incremental(
        spark, root, zorder_by=("x", "y"), target_bytes=16 * 1024
    )
    assert m1["files_rewritten"] == 6 and m1["files_kept"] == 0
    opt1_files = set(m1["files"])

    snapshot_commit(batch(3000, 4000).coalesce(2), root)
    snapshot_commit(batch(4000, 5000).coalesce(2), root)
    snapshot_delete_mor(
        spark, root, condition="payload = 3005", key_col="payload"
    )
    m2 = snapshot_optimize_incremental(
        spark, root, zorder_by=("x", "y"), target_bytes=16 * 1024
    )
    assert m2["files_kept"] == len(opt1_files)
    assert m2["files_rewritten"] == 4
    assert opt1_files < set(m2["files"])  # kept by pointer, untouched
    # the tombstone FOLDED into the rewrite for the commits it rewrote:
    # it survives only narrowed to the kept (already-optimized) commits
    # it also applied to — never to the clean new commit
    new_cids = {
        rel.split(os.sep)[1] for rel in set(m2["files"]) - opt1_files
    }
    for t in m2["tombstones"]:
        assert not (set(t["commits"]) & new_cids), t
        assert set(t["commits"]) <= set(m2["optimized_commits"]), t
    rows = {r.payload for r in snapshot_read(spark, root).collect()}
    assert rows == set(range(5000)) - {3005}

    # idempotent maintenance loop: nothing unoptimized -> no-op
    m3 = snapshot_optimize_incremental(spark, root, zorder_by=("x", "y"))
    assert m3["version"] == m2["version"]

    # change feed: appends + the MOR delete replay, the optimize commits
    # verify-and-skip (no rows at their versions)
    ch = snapshot_table_changes(spark, root, m1["version"], m2["version"])
    by_type: dict = {}
    for r in ch.collect():
        by_type.setdefault(r._change_type, set()).add(r.payload)
        assert r._commit_version != m2["version"]
    assert by_type["insert"] == set(range(3000, 5000))
    assert by_type["delete"] == {3005}

    # pruning payoff: a 2-D box scan skips files in BOTH generations
    plan = snapshot_scan_files(root, ranges={"x": (0, 7), "y": (0, 7)})
    assert plan["skipped"] > 0 and plan["kept"] < m2["n_files"], plan


def test_snapshot_sketch_distinct_metadata_only(spark, tmp_path):
    """Puffin-style per-commit HLL sketches: COUNT DISTINCT over any
    version answers from O(commits) metadata blobs. Pins: sticky config
    across appends, metadata-only merge (scanned_files == 0), tombstoned
    commits fall back to scanning JUST their files, and a compaction
    re-sketches its rewrite so the table returns to metadata-only."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_approx_distinct,
        snapshot_compact,
        snapshot_delete_mor,
    )

    root = str(tmp_path / "t")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            "id", (F.col("id") % 41).alias("u")
        ).coalesce(2)

    snapshot_commit(batch(0, 3000), root, sketch_cols=["u", "id"])
    snapshot_commit(batch(3000, 6000), root)  # config is sticky
    snapshot_commit(batch(6000, 9000), root)
    assert _load_manifest(root, 3)["sketch"] == {"cols": ["id", "u"]}

    r = snapshot_approx_distinct(spark, root, "u")
    assert r == {"estimate": 41, "sketched_commits": 3, "scanned_files": 0}
    r = snapshot_approx_distinct(spark, root, "id")
    assert r["scanned_files"] == 0 and r["sketched_commits"] == 3
    assert abs(r["estimate"] - 9000) / 9000 < 0.05  # HLL precision band

    # MOR delete: the sketch cannot forget rows — ONLY the tombstoned
    # commits' files are scanned, the rest stay metadata
    snapshot_delete_mor(spark, root, condition="id < 100", key_col="id")
    r = snapshot_approx_distinct(spark, root, "id")
    assert r["sketched_commits"] == 0 or r["scanned_files"] > 0
    assert abs(r["estimate"] - 8900) / 8900 < 0.05
    # version pin: the pre-delete generation still answers metadata-only
    r = snapshot_approx_distinct(spark, root, "id", version=3)
    assert r["scanned_files"] == 0 and r["sketched_commits"] == 3

    # compaction folds the tombstone AND re-sketches the rewrite:
    # metadata-only again
    snapshot_compact(spark, root, target_bytes=1 << 30)
    r = snapshot_approx_distinct(spark, root, "id")
    assert r["scanned_files"] == 0 and r["sketched_commits"] == 1
    assert abs(r["estimate"] - 8900) / 8900 < 0.05

    with pytest.raises(ValueError, match="sketch_cols"):
        snapshot_commit(
            spark.range(3).select(F.rand().alias("d")),
            str(tmp_path / "x"), sketch_cols=["d"],
        )


def test_snapshot_sketch_backfill_no_rewrite(spark, tmp_path):
    """Backfilling sketches for pre-config commits: new sidecars beside
    the immutable originals, one metadata-only repoint commit, zero data
    files touched; older versions keep their original sidecars (time
    travel unaffected); tombstoned commits are skipped; a second call is
    a no-op; the advisor's sketch_backfill recommendation clears."""
    from airflow_postgres_csv_spark.operators.maintenance import (
        snapshot_maintenance_plan,
    )
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_approx_distinct,
        snapshot_delete_mor,
        snapshot_sketch_backfill,
    )

    root = str(tmp_path / "t")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            "id", (F.col("id") % 23).alias("u")
        ).coalesce(1)

    snapshot_commit(batch(0, 2000), root)          # pre-config
    snapshot_commit(batch(2000, 4000), root)       # pre-config
    snapshot_delete_mor(spark, root, condition="id = 2001", key_col="id")
    snapshot_commit(batch(4000, 6000), root, sketch_cols=["u", "id"])

    plan = snapshot_maintenance_plan(root, target_bytes=1024)
    assert [a["action"] for a in plan["actions"]] == ["sketch_backfill"]
    r0 = snapshot_approx_distinct(spark, root, "u")
    assert r0["scanned_files"] > 0  # pre-config commits force scans

    m = snapshot_sketch_backfill(spark, root)
    # tombstoned commits are SKIPPED (a sketch cannot forget MOR rows),
    # and the delete-time tombstone is zone-narrowed to the commits that
    # can actually hold the deleted key: id=2001 lives in the second
    # pre-config commit only, so the key-disjoint first commit IS
    # backfillable while the tombstoned one still forces scans
    assert m["backfilled_commits"] == 1
    assert snapshot_approx_distinct(spark, root, "u")["scanned_files"] > 0
    root2 = str(tmp_path / "clean")
    snapshot_commit(batch(0, 2000), root2)
    snapshot_commit(batch(2000, 4000), root2)
    snapshot_commit(batch(4000, 6000), root2, sketch_cols=["u"])
    m1 = snapshot_sketch_backfill(spark, root2)
    assert m1["backfilled_commits"] == 2
    assert sorted(m1["files"]) == sorted(_load_manifest(root2, 3)["files"])
    r = snapshot_approx_distinct(spark, root2, "u")
    assert r == {"estimate": 23, "sketched_commits": 3, "scanned_files": 0}
    # older version still points at the ORIGINAL sidecars
    assert _load_manifest(root2, 3)["sidecars"] != m1["sidecars"]
    r_old = snapshot_approx_distinct(spark, root2, "u", version=3)
    assert r_old["scanned_files"] > 0
    # idempotent: second call publishes nothing
    m2 = snapshot_sketch_backfill(spark, root2)
    assert m2["backfilled_commits"] == 0 and m2["version"] == m1["version"]
    # cols= extends the config and backfills the new column everywhere
    m3 = snapshot_sketch_backfill(spark, root2, cols=["id"])
    assert m3["backfilled_commits"] == 3
    r = snapshot_approx_distinct(spark, root2, "id")
    assert r["scanned_files"] == 0 and abs(r["estimate"] - 6000) / 6000 < 0.05
    # advisor clears
    plan = snapshot_maintenance_plan(root2, target_bytes=1024, max_versions=16)
    assert plan["actions"] == []
    # feeds: the backfill version emits no row changes
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_table_changes,
    )

    assert snapshot_table_changes(spark, root2, 3, m1["version"]).count() == 0


def test_streaming_ingestion_maintains_sketches(spark, tmp_path):
    """The sticky sketch config rides the exactly-once streaming sink
    with no sink-side code: every micro-batch commit sketches its files,
    so a streamed bronze table answers distinct counts from metadata
    alone at any point — the 100 TB profiling story for live tables."""
    import os as _os

    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_approx_distinct,
    )
    from airflow_postgres_csv_spark.streaming.sinks import start_snapshot_sink

    root = str(tmp_path / "snap")
    # seed commit establishes the config (a streamed table is usually
    # created by its first micro-batch; here the DDL-style seed does it)
    snapshot_commit(
        spark.range(0).select("id", (F.col("id") % 13).alias("u")),
        root, sketch_cols=["u"],
    )
    src = str(tmp_path / "in")
    _os.makedirs(src)
    for idx, (lo, hi) in enumerate([(0, 400), (400, 900), (900, 1300)]):
        stage = str(tmp_path / f"stage_{idx}")
        spark.range(lo, hi).select(
            "id", (F.col("id") % 13).alias("u")
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        for f in _os.listdir(stage):
            if f.endswith(".parquet"):
                _os.rename(
                    _os.path.join(stage, f),
                    _os.path.join(src, f"{idx:03d}.parquet"),
                )
    stream = (
        spark.readStream.schema("id long, u long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_snapshot_sink(stream, root, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert len(snapshot_versions(root)) == 4  # seed + 3 micro-batches
    r = snapshot_approx_distinct(spark, root, "u")
    # 4 sketched commits: the empty seed's sketch is a valid empty blob
    assert r == {"estimate": 13, "sketched_commits": 4, "scanned_files": 0}
    # and pinned to a mid-stream version: still metadata-only
    r2 = snapshot_approx_distinct(spark, root, "u", version=3)
    assert r2["scanned_files"] == 0 and r2["sketched_commits"] == 3


def test_expire_age_based_retention(spark, tmp_path):
    """older_than_ns protects recent versions from keep_last (Iceberg's
    expire_snapshots(older_than=..., retain_last=...)): only versions
    both superseded beyond keep_last AND older than the cutoff drop."""
    root = str(tmp_path / "t")
    ms = [snapshot_commit(_df(spark, k * 5, (k + 1) * 5).coalesce(1), root)
          for k in range(4)]
    # cutoff between v2 and v3: v1, v2 old enough to drop; v3 protected
    cutoff = ms[2]["committed_at"]
    r = snapshot_expire(root, keep_last=1, older_than_ns=cutoff)
    assert r["expired_versions"] == [1, 2]
    assert snapshot_versions(root) == [3, 4]
    assert snapshot_read(spark, root, version=3).count() == 15
    # without the cutoff, keep_last=1 drops v3 too
    r = snapshot_expire(root, keep_last=1)
    assert r["expired_versions"] == [3]
    assert snapshot_read(spark, root).count() == 20


def test_snapshot_alter_metadata_only(spark, tmp_path, monkeypatch):
    """Metadata-only ALTER: add/widen/drop evolve the schema in a
    zero-data commit (same pinned files, no Spark job), reads align
    instantly, time travel keeps the old shape, and dependent columns
    refuse to drop."""
    from pyspark.sql.types import LongType

    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_alter,
        snapshot_delete_mor,
    )

    root = str(tmp_path / "t")
    snapshot_commit(
        spark.range(0, 5).select(
            F.col("id").cast("int").alias("id"), (F.col("id") * 2).alias("v")
        ).coalesce(1),
        root,
    )
    m1 = snapshot_versions(root)[-1]
    m = snapshot_alter(
        root,
        add={"note": "string", "score": "double"},
        widen={"id": "long"},
        column_defaults={"note": "n/a"},
    )
    assert m["mode"] == "alter" and m["n_files"] == 1
    df = snapshot_read(spark, root)
    assert df.schema["id"].dataType == LongType()
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [(i, i * 2, "n/a", None) for i in range(5)]
    # time travel: the pre-ALTER version still reads the old shape
    assert snapshot_read(spark, root, version=m1).columns == ["id", "v"]
    # appends under the evolved schema coexist with old files
    snapshot_commit(
        spark.createDataFrame(
            [(100, 1, "x", 0.5)], "id long, v long, note string, score double"
        ),
        root,
    )
    assert snapshot_read(spark, root).count() == 6
    # drop works and refuses protected columns
    snapshot_alter(root, drop=["score"])
    assert "score" not in snapshot_read(spark, root).columns
    snapshot_delete_mor(spark, root, "id = 100", key_col="id")
    with pytest.raises(ValueError, match="depend"):
        snapshot_alter(root, drop=["id"])  # tombstone key
    with pytest.raises(ValueError, match="safe widening"):
        snapshot_alter(root, widen={"v": "string"})
    with pytest.raises(ValueError, match="already exists"):
        snapshot_alter(root, add={"v": "long"})


def test_alter_preserves_hidden_partition_pruning(spark, tmp_path):
    """Metadata-only ALTER must not disturb declared partition specs:
    pruning keyed on partition values still skips commits after the
    ALTER, and post-ALTER appends keep partitioning."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_alter,
        snapshot_scan_files,
    )

    root = str(tmp_path / "t")
    snapshot_commit(
        _df(spark, 0, 40), root, partition_transforms=[("id", "bucket", 4)]
    )
    m = snapshot_alter(root, add={"note": "string"})
    assert m["partition_specs"] and m["commit_partitions"]
    snapshot_commit(
        _df(spark, 40, 80).withColumn("note", F.lit("x")), root,
        partition_transforms=[("id", "bucket", 4)],
    )
    plan = snapshot_scan_files(root, "id", 0, 0)  # one bucket's values
    assert 0 < plan["kept"] < plan["kept"] + plan["skipped"]
    # the declared-spec column refuses to drop
    import pytest as _p

    with _p.raises(ValueError, match="depend"):
        snapshot_alter(root, drop=["id"])


def test_snapshot_alter_rename_grid(spark, tmp_path):
    """ALTER RENAME COLUMN (VERDICT r9 item 4): a zero-data commit whose
    name lineage (column_history) every read path resolves — pre-rename
    files read under the new name, chained renames compose, time travel
    shows each version's own names, appends under each epoch coexist,
    MOR deletes issued after a rename reach pre-rename files, zone-map
    pruning follows the lineage, CDC surfaces old versions' rows under
    the latest names, and protected / retired names refuse."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_alter,
        snapshot_delete_mor,
        snapshot_scan_files,
        snapshot_table_changes,
    )

    root = str(tmp_path / "t")
    # epoch "v": two commits with disjoint id ranges (commit-range pruning)
    snapshot_commit(_df(spark, 0, 10).coalesce(1), root)
    snapshot_commit(_df(spark, 10, 20).coalesce(1), root)
    m = snapshot_alter(root, rename={"v": "w"})
    assert m["mode"] == "alter" and m["n_files"] == 2  # zero-data commit
    assert m["column_history"] == {"w": ["v"]}
    df = snapshot_read(spark, root)
    assert df.columns == ["id", "w"]
    assert sorted(tuple(r) for r in df.collect()) == [
        (i, 2 * i) for i in range(20)
    ]
    # time travel: each version keeps its own names
    assert snapshot_read(spark, root, version=2).columns == ["id", "v"]
    # append under the new name, then chain a second rename
    snapshot_commit(
        spark.range(20, 30).select("id", (F.col("id") * 2).alias("w")).coalesce(1),
        root,
    )
    m2 = snapshot_alter(root, rename={"w": "x"})
    assert m2["column_history"] == {"x": ["w", "v"]}
    snapshot_commit(
        spark.range(30, 40).select("id", (F.col("id") * 2).alias("x")).coalesce(1),
        root,
    )
    df = snapshot_read(spark, root)
    assert df.columns == ["id", "x"]
    assert sorted(tuple(r) for r in df.collect()) == [
        (i, 2 * i) for i in range(40)
    ]
    # a MOR delete issued AFTER the renames, keyed on the renamed column,
    # removes rows living in files of every epoch (v-, w-, and x-written)
    snapshot_delete_mor(spark, root, "x % 10 = 8", key_col="x")
    got = sorted(r[0] for r in snapshot_read(spark, root).select("id").collect())
    assert got == [i for i in range(40) if (2 * i) % 10 != 8]
    # zone-map / commit-range pruning follows the lineage: a scan on the
    # CURRENT name prunes commits written under the old name
    plan = snapshot_scan_files(root, "x", 0, 5)
    assert plan["commits_skipped"] >= 2 and plan["kept"] < 4
    # CDC: pre-rename versions' inserts surface under the latest name
    ch = snapshot_table_changes(spark, root, 0, 5)
    assert set(ch.columns) == {"id", "x", "_commit_version", "_change_type"}
    v1_rows = sorted(
        r.x for r in ch.where("_commit_version = 1").collect()
    )
    assert v1_rows == [2 * i for i in range(10)]
    # refusals: tombstone-keyed / retired / taken names
    with pytest.raises(ValueError, match="depend"):
        snapshot_alter(root, rename={"x": "y"})  # x is a tombstone key now
    with pytest.raises(ValueError, match="retired|once carried"):
        snapshot_alter(root, rename={"id": "v"})
    with pytest.raises(ValueError, match="once carried"):
        snapshot_alter(root, add={"w": "long"})
    with pytest.raises(ValueError, match="name taken"):
        snapshot_alter(root, rename={"id": "x"})
    with pytest.raises(ValueError, match="no such column"):
        snapshot_alter(root, rename={"zz": "y"})


def test_alter_rename_through_data_source_and_sql(spark, tmp_path):
    """The batch Python data source and the SQL view resolve the rename
    lineage executor-side: pre-rename parquet (old physical name) reads
    under the current name, pushdown on the current name still prunes,
    and the streaming feed aligns old files to a post-rename stream."""
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_alter
    from airflow_postgres_csv_spark.sources.snapshot_batch import (
        register_snapshot_table,
        snapshot_sql_register,
    )

    register_snapshot_table(spark)
    root = str(tmp_path / "t")
    snapshot_commit(_df(spark, 0, 100).coalesce(1), root)
    snapshot_commit(_df(spark, 100, 200).coalesce(1), root)
    snapshot_alter(root, rename={"v": "val"})
    snapshot_commit(
        spark.range(200, 300).select("id", (F.col("id") * 2).alias("val")).coalesce(1),
        root,
    )
    df = spark.read.format("snapshot_table").load(root)
    assert df.columns == ["id", "val"]
    assert df.count() == 300
    snapshot_sql_register(spark, "renamed_t", root)
    row = spark.sql(
        "SELECT COUNT(*) AS n, CAST(SUM(val) AS BIGINT) AS s "
        "FROM renamed_t WHERE id < 150"
    ).first()
    assert (row.n, row.s) == (150, 2 * sum(range(150)))
    # pruning on a filter over the renamed id range still plans fewer files
    n_full = spark.sql("SELECT * FROM renamed_t").rdd.getNumPartitions()
    n_sel = spark.sql(
        "SELECT * FROM renamed_t WHERE id >= 250"
    ).rdd.getNumPartitions()
    assert 0 < n_sel < n_full
    # streaming feed started AFTER the rename: pre-rename files align
    from airflow_postgres_csv_spark.streaming.snapshot_source import (
        register_snapshot_feed,
    )

    register_snapshot_feed(spark)
    out = []
    q = (
        spark.readStream.format("snapshot_feed")
        .option("root", root)
        .load()
        .writeStream.foreachBatch(lambda b, _: out.extend(b.collect()))
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    q.awaitTermination(120)
    vals = sorted((r.id, r.val) for r in out)
    assert vals == [(i, 2 * i) for i in range(300)]


def test_clone_carries_rename_lineage_and_index_model(spark, tmp_path):
    """snapshot_clone must carry the rename lineage (column_history),
    the sketch CONFIG, and frozen index/model metadata — a clone of a
    renamed table otherwise silently null-fills the renamed column for
    pre-rename files, and a cloned ANN index cannot serve."""
    from airflow_postgres_csv_spark.operators import similarity as SIM
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_alter,
        snapshot_clone,
    )

    root = str(tmp_path / "t")
    snapshot_commit(_df(spark, 0, 10).coalesce(1), root, sketch_cols=["id"])
    snapshot_alter(root, rename={"v": "w"})
    dst = str(tmp_path / "t2")
    m = snapshot_clone(root, dst)
    assert m["column_history"] == {"w": ["v"]} and m["sketch"]
    got = sorted(tuple(r) for r in snapshot_read(spark, dst).collect())
    assert got == [(i, 2 * i) for i in range(10)]  # no null-fill

    emb = spark.range(0, 100).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.sin(F.col("id") * i * 0.7 + i).cast("float"),
        ).alias("embedding"),
    )
    iroot, iclone = str(tmp_path / "ivf"), str(tmp_path / "ivf2")
    SIM.ivf_build_index(emb, iroot, n_cells=8)
    snapshot_clone(iroot, iclone)
    out = SIM.ivf_search_index(
        spark, iclone, emb.filter("vec_id < 3"), k=3, n_probe=8
    )
    assert out.count() == 9  # the cloned index serves with its model


def test_rollback_restores_lineage_and_index_model(spark, tmp_path):
    """snapshot_rollback builds its manifest from an explicit key list —
    it must restore the target's rename lineage and frozen index/model
    metadata, or a post-rename rollback NULL-fills the renamed column
    and a rolled-back index cannot serve."""
    from airflow_postgres_csv_spark.operators import similarity as SIM
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_alter,
        snapshot_rollback,
    )

    root = str(tmp_path / "t")
    snapshot_commit(_df(spark, 0, 10).coalesce(1), root)
    snapshot_alter(root, rename={"v": "w"})
    snapshot_commit(
        spark.range(10, 20).select("id", (F.col("id") * 2).alias("w")).coalesce(1),
        root,
    )
    m = snapshot_rollback(spark, root, 2)  # post-rename, pre-append
    assert m["column_history"] == {"w": ["v"]}
    got = sorted(tuple(r) for r in snapshot_read(spark, root).collect())
    assert got == [(i, 2 * i) for i in range(10)]  # no NULL-fill

    emb = spark.range(0, 100).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.sin(F.col("id") * i * 0.7 + i).cast("float"),
        ).alias("embedding"),
    )
    iroot = str(tmp_path / "ivf")
    SIM.ivf_build_index(emb.where("vec_id < 80"), iroot, n_cells=8)
    SIM.ivf_index_append(emb.where("vec_id >= 80"), iroot)
    snapshot_rollback(spark, iroot, 1)
    head = _load_manifest(iroot, snapshot_versions(iroot)[-1])
    assert head["ann_index"]["kind"] == "ivf"
    out = SIM.ivf_search_index(
        spark, iroot, emb.filter("vec_id < 3"), k=3, n_probe=8
    )
    assert out.count() == 9


def test_alter_rename_validation_holes_closed(spark, tmp_path):
    """Rename validation: duplicate targets refuse; renaming onto a
    same-ALTER-dropped name refuses (the dropped column's physical data
    would resurface); dropping a column reserves its name AND its rename
    chain forever (re-adding would re-bind stale physical data)."""
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_alter

    root = str(tmp_path / "t")
    snapshot_commit(
        spark.range(0, 5).select(
            "id", (F.col("id") * 2).alias("a"), (F.col("id") * 3).alias("b")
        ).coalesce(1),
        root,
    )
    with pytest.raises(ValueError, match="duplicate target"):
        snapshot_alter(root, rename={"a": "x", "b": "x"})
    with pytest.raises(ValueError, match="name taken"):
        snapshot_alter(root, drop=["b"], rename={"a": "b"})
    # drop reserves the name and, transitively, the rename chain
    snapshot_alter(root, rename={"a": "a2"})
    m = snapshot_alter(root, drop=["a2"])
    assert sorted(m["retired_columns"]) == ["a", "a2"]
    for dead in ("a", "a2"):
        with pytest.raises(ValueError, match="once carried"):
            snapshot_alter(root, add={dead: "long"})
        with pytest.raises(ValueError, match="once carried"):
            snapshot_alter(root, rename={"b": dead})
    # and the reservation survives later commits (sticky)
    snapshot_commit(
        spark.range(5, 8).select("id", (F.col("id") * 3).alias("b")).coalesce(1),
        root,
    )
    with pytest.raises(ValueError, match="once carried"):
        snapshot_alter(root, add={"a": "long"})


def test_sort_order_sticky_layout_and_pruning(spark, tmp_path):
    """Declared sort orders (Iceberg write-order): sticky across plain
    commits, every commit written under it lands range-clustered on the
    keys, and the payoff is structural — a range probe on the sort key
    skips MOST files via the zone maps (the pin requires >= half). The
    order survives direct-publish maintenance (merge) via inheritance,
    the merge's own commit is correctly NOT stamped sorted, and
    snapshot_compact restores full sorted coverage."""
    from airflow_postgres_csv_spark.operators.maintenance import (
        snapshot_table_stats,
    )
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_compact,
        snapshot_merge,
        snapshot_scan,
        snapshot_scan_files,
    )

    from airflow_postgres_csv_spark.operators import snapshots as S

    root = str(tmp_path / "t")

    def scrambled(lo, hi):
        return spark.range(lo, hi).select(
            ((F.col("id") * 37) % 1000).alias("v"), "id"
        )

    # AQE would coalesce this small shuffle into one file and hide the
    # layout; at real scale the range write produces many files
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        m1 = snapshot_commit(scrambled(0, 4000), root, sort_order=["v"])
        m2 = snapshot_commit(scrambled(4000, 8000), root)  # sticky
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    m = S._load_manifest(root, snapshot_versions(root)[-1])
    assert m["sort_order"] == ["v"]
    assert set(m["sorted_commits"]) == {m1["commit_id"], m2["commit_id"]}
    plan = snapshot_scan_files(root, "v", 100, 199)
    total = plan["kept"] + plan["skipped"]
    assert total >= 8 and plan["skipped"] >= total / 2, plan
    got = sorted(
        r.id for r in snapshot_scan(spark, root, "v", 100, 199).collect()
    )
    want = sorted(
        r.id
        for r in snapshot_read(spark, root)
        .where("v between 100 and 199")
        .collect()
    )
    assert got == want and got
    st = snapshot_table_stats(root)
    assert st["sort_order"] == ["v"] and st["sorted_coverage"] == 1.0
    # COW merge publishes directly (bypasses snapshot_commit): the order
    # must survive by inheritance, the merge commit is NOT sorted
    snapshot_merge(
        spark, root,
        spark.createDataFrame([(5, 999_999)], "v long, id long"),
        key="id",
    )
    st = snapshot_table_stats(root)
    assert st["sort_order"] == ["v"] and st["sorted_coverage"] < 1.0
    # compact honors the declared order and restores coverage
    snapshot_compact(spark, root, target_bytes=64 * 1024)
    st = snapshot_table_stats(root)
    assert st["sorted_coverage"] == 1.0
    assert snapshot_read(spark, root).count() == 8001


def test_sort_order_redeclare_voids_stamps_and_validates(spark, tmp_path):
    """Re-declaring a DIFFERENT order replaces it and voids the previous
    layout stamps (old commits are not sorted by the new keys); invalid
    columns are refused loudly."""
    from airflow_postgres_csv_spark.operators import snapshots as S

    root = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        "id", (F.col("id") % 7).alias("v"),
        F.array(F.lit(1)).alias("arr"),
    )
    m1 = snapshot_commit(df.drop("arr"), root, sort_order=["v"])
    m2 = snapshot_commit(
        spark.range(100, 200).select("id", (F.col("id") % 7).alias("v")),
        root, sort_order=["id"],
    )
    m = S._load_manifest(root, snapshot_versions(root)[-1])
    assert m["sort_order"] == ["id"]
    assert m["sorted_commits"] == [m2["commit_id"]], (
        "stamps under the old order must be voided"
    )
    assert m1["commit_id"] not in m["sorted_commits"]
    with pytest.raises(ValueError, match="no such column"):
        snapshot_commit(df.drop("arr"), root, sort_order=["nope"])
    with pytest.raises(ValueError, match="orderable"):
        snapshot_commit(df, root, sort_order=["arr"],
                        allow_schema_change=True)


def test_sort_order_alter_interplay(spark, tmp_path):
    """ALTER vs declared sort order: RENAME follows the order to the new
    name (layout + stamps untouched), DROP of an order column is refused
    with guidance, and a schema-changing commit that omits the order's
    columns raises clearly instead of crashing inside the range write."""
    from airflow_postgres_csv_spark.operators import snapshots as S
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_alter,
    )

    root = str(tmp_path / "t")
    snapshot_commit(
        spark.range(0, 50).select("id", (F.col("id") % 9).alias("v")),
        root, sort_order=["v"],
    )
    snapshot_alter(root, rename={"v": "score"})
    m = S._load_manifest(root, snapshot_versions(root)[-1])
    assert m["sort_order"] == ["score"]
    assert len(m["sorted_commits"]) == 1  # stamps survive the rename
    snapshot_commit(  # sticky under the NEW name
        spark.range(50, 80).select("id", (F.col("id") % 9).alias("score")),
        root,
    )
    m = S._load_manifest(root, snapshot_versions(root)[-1])
    assert len(m["sorted_commits"]) == 2
    with pytest.raises(ValueError, match="sort order"):
        snapshot_alter(root, drop=["score"])
    with pytest.raises(ValueError, match="sort order"):
        snapshot_commit(
            spark.range(3).select("id"), root, allow_schema_change=True,
            mode="overwrite",
        )
