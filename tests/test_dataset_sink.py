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
