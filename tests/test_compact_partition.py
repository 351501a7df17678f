"""Partition-scoped compaction (snapshot_compact_partition)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.snapshots import (
    _load_manifest,
    snapshot_commit,
    snapshot_compact_partition,
    snapshot_delete_mor,
    snapshot_read,
    snapshot_table_changes,
    snapshot_versions,
)


def _mk(spark, lang, n, base=0):
    return spark.createDataFrame(
        [(base + i, lang, (base + i) * 10) for i in range(n)],
        "id int, lang string, amt int",
    )


def test_compact_partition_scoped_rewrite(spark, tmp_path):
    """Only the matching partition's files rewrite; other partitions are
    inherited by pointer; tombstones on the matched files fold in while
    entries for untouched files survive; the change feed verifies and
    skips the commit; reads stay identical."""
    root = str(tmp_path / "t")
    for i, (lang, base) in enumerate(
        [("en", 0), ("fr", 100), ("en", 200), ("en", 300)]
    ):
        snapshot_commit(
            _mk(spark, lang, 3, base), root,
            partition_transforms=[("lang", "identity")] if i == 0 else None,
        )
    # MOR deletes on BOTH partitions: en fold-in, fr must survive
    snapshot_delete_mor(spark, root, "id = 200", "id")
    snapshot_delete_mor(spark, root, "id = 101", "id")
    before = {(r["id"], r["lang"]) for r in snapshot_read(spark, root).collect()}
    head_v = snapshot_versions(root)[-1]
    out = snapshot_compact_partition(spark, root, {"lang": "en"})
    assert out["files_rewritten"] == 3 and out["files_kept"] == 1
    after = {(r["id"], r["lang"]) for r in snapshot_read(spark, root).collect()}
    assert after == before
    m = _load_manifest(root, snapshot_versions(root)[-1])
    # en tombstone folded away; fr tombstone narrowed but alive
    assert len(m.get("tombstones", [])) == 1
    # time travel: pre-compact version intact
    assert {
        (r["id"], r["lang"])
        for r in snapshot_read(spark, root, version=head_v).collect()
    } == before
    # change feed across the compaction: verified row-preserving, skipped
    ch = snapshot_table_changes(spark, root, head_v).collect()
    assert ch == []
    # idempotent below min_files: en is now a single file
    again = snapshot_compact_partition(spark, root, {"lang": "en"})
    assert "files_rewritten" not in again


def test_compact_partition_sorted_stamp_and_guards(spark, tmp_path):
    """A declared sort order earns the rewritten commit its sorted
    stamp; non-identity columns and unpartitioned tables are refused."""
    root = str(tmp_path / "t")
    snapshot_commit(
        _mk(spark, "en", 4), root,
        partition_transforms=[("lang", "identity")],
        sort_order=["amt"],
    )
    # a second unsorted-path write (merge-style) keeps spec
    snapshot_commit(_mk(spark, "en", 4, 50), root)
    out = snapshot_compact_partition(spark, root, {"lang": "en"})
    m = _load_manifest(root, snapshot_versions(root)[-1])
    assert out["commit_id"] in m.get("sorted_commits", [])
    with pytest.raises(ValueError, match="not an identity partition"):
        snapshot_compact_partition(spark, root, {"amt": 10})
    root2 = str(tmp_path / "u")
    snapshot_commit(_mk(spark, "en", 3), root2)
    with pytest.raises(ValueError, match="declared partition spec"):
        snapshot_compact_partition(spark, root2, {"lang": "en"})
