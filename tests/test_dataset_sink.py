"""Partitioned-dataset sink: hive layout, file-size bounding, pruning."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.catalog import load
from airflow_postgres_csv_spark.operators.dataset import write_partitioned_dataset
from airflow_postgres_csv_spark.plans import introspect as I

SF = "/root/testdata/sf0.001"


def test_partitioned_write_layout_and_roundtrip(spark, tmp_path):
    out = str(tmp_path / "corpus")
    docs = load(spark, SF, "documents")
    n = write_partitioned_dataset(
        docs, out, partition_by=["lang"], max_records_per_file=50,
        sort_within=["doc_id"],
    )
    assert n == docs.count()
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    dirs = {os.path.basename(p) for p in glob.glob(os.path.join(out, "lang=*"))}
    assert dirs == {f"lang={l}" for l in langs}
    # maxRecordsPerFile bound respected
    for d in dirs:
        for f in glob.glob(os.path.join(out, d, "*.parquet")):
            assert spark.read.parquet(f).count() <= 50
    back = spark.read.parquet(out)
    assert back.count() == n
    # partition pruning: a lang filter must not scan other partitions
    one = back.filter(back.lang == sorted(langs)[0])
    plan = I.formatted_plan(one)
    assert "PartitionFilters" in plan


def test_compact_dataset_shrinks_file_count_preserves_rows(spark, tmp_path):
    from airflow_postgres_csv_spark.operators.dataset import compact_dataset

    path = str(tmp_path / "frag")
    # fragment: 40 files of a few rows each
    spark.range(2000).withColumn("lang", (F.col("id") % 3).cast("string")) \
        .repartition(40).write.parquet(path)
    before = compact_dataset(spark, path, target_bytes=64 * 1024 * 1024)
    assert before["files_before"] >= 40
    assert before["files_after"] < before["files_before"]
    back = spark.read.parquet(path)
    assert back.count() == 2000
    assert back.agg(F.sum("id")).collect()[0][0] == 2000 * 1999 // 2


def test_compact_dataset_partitioned_layout_kept(spark, tmp_path):
    import os

    from airflow_postgres_csv_spark.operators.dataset import compact_dataset

    path = str(tmp_path / "part")
    df = spark.range(300).withColumn("lang", (F.col("id") % 3).cast("string"))
    df.repartition(20).write.partitionBy("lang").parquet(path)
    res = compact_dataset(
        spark, path, target_bytes=64 * 1024 * 1024, partition_cols=["lang"]
    )
    assert res["rows"] == 300
    assert sorted(
        d for d in os.listdir(path) if d.startswith("lang=")
    ) == ["lang=0", "lang=1", "lang=2"]
    back = spark.read.parquet(path)
    assert back.where("lang = '1'").count() == 100


def test_schema_evolution_merge_read(spark, tmp_path):
    """Long-lived datasets gain columns across writer generations; readers
    must see the union schema with NULLs for pre-evolution files.
    mergeSchema is opt-in (it costs a footer read per file at planning
    time — at 100 TB pin the schema explicitly instead)."""
    path = str(tmp_path / "evolve")
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(path)
    spark.range(10, 20).selectExpr(
        "id", "id * 2 AS v", "'x' || id AS tag"
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "v", "tag"}
    assert merged.count() == 20
    assert merged.where("tag IS NULL").count() == 10
    assert merged.where("tag = 'x15'").count() == 1

    # explicit-schema read (the 100 TB path): same union view, no
    # per-file footer merge at planning time
    pinned = spark.read.schema("id long, v long, tag string").parquet(path)
    assert pinned.where("tag IS NULL").count() == 10


def test_corrupt_parquet_file_handling(spark, tmp_path):
    """A multi-terabyte dataset will eventually contain a truncated or
    garbage file. Default: the scan fails loudly (correctness first);
    spark.sql.files.ignoreCorruptFiles=true quarantines the bad file and
    scans the rest — the knob an operator flips for a best-effort read."""
    import pytest

    path = str(tmp_path / "withbad")
    spark.range(100).selectExpr("id", "id * 2 AS v").write.parquet(path)
    with open(os.path.join(path, "part-corrupt.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer")

    df = spark.read.schema("id long, v long").parquet(path)
    with pytest.raises(Exception):
        df.count()

    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        assert spark.read.schema("id long, v long").parquet(path).count() == 100
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)


def test_compact_dataset_snapshot_mode_delegates_to_manifest_commit(spark, tmp_path):
    """snapshot=True routes compaction through the snapshot subsystem's
    atomic manifest commit: no directory swap, no missing-path window,
    time travel across the compaction intact."""
    from airflow_postgres_csv_spark.operators.dataset import compact_dataset
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_commit,
        snapshot_read,
    )

    root = str(tmp_path / "snap")
    for lo in range(0, 40, 10):
        snapshot_commit(
            spark.range(lo, lo + 10).selectExpr("id", "id * 2 AS v").repartition(3),
            root,
        )
    res = compact_dataset(spark, root, target_bytes=1 << 30, snapshot=True)
    assert res["files_after"] == 1 and res["files_before"] >= 12
    assert res["version"] == 5
    assert sorted(r.id for r in snapshot_read(spark, root).collect()) == list(range(40))
    assert snapshot_read(spark, root, version=1).count() == 10
    # a plain directory is refused loudly instead of silently mistreated
    plain = str(tmp_path / "plain")
    spark.range(5).write.parquet(plain)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="not a snapshot root"):
        compact_dataset(spark, plain, snapshot=True)


def test_compact_swap_recovery_rolls_forward_after_hard_kill(spark, tmp_path):
    """Simulate a SIGKILL between compact_dataset's two renames: path is
    missing, both staging dirs exist, the marker names them. Recovery must
    roll FORWARD to the verified compacted copy and clean up."""
    import json
    import os

    from airflow_postgres_csv_spark.operators.dataset import recover_compact_swap

    path = str(tmp_path / "ds")
    spark.range(100).selectExpr("id", "id * 3 AS v").write.parquet(path)
    # fabricate the mid-swap state: old holds the original, tmp the new copy
    old = path + "__old-dead"
    tmp = path + "__compact-beef"
    os.rename(path, old)
    spark.read.parquet(old).coalesce(1).write.parquet(tmp)
    with open(path + "__swap.json", "w") as f:
        json.dump({"path": path, "old": old, "tmp": tmp}, f)
    assert recover_compact_swap(path) == "forward"
    assert not os.path.exists(old) and not os.path.exists(tmp)
    assert not os.path.exists(path + "__swap.json")
    assert spark.read.parquet(path).count() == 100
    # idempotent on a clean tree
    assert recover_compact_swap(path) == "clean"


def test_compact_swap_recovery_rolls_back_when_no_new_copy(spark, tmp_path):
    import json
    import os

    from airflow_postgres_csv_spark.operators.dataset import recover_compact_swap

    path = str(tmp_path / "ds")
    spark.range(50).write.parquet(path)
    old = path + "__old-dead"
    os.rename(path, old)
    with open(path + "__swap.json", "w") as f:
        json.dump({"path": path, "old": old, "tmp": path + "__compact-gone"}, f)
    assert recover_compact_swap(path) == "back"
    assert spark.read.parquet(path).count() == 50
