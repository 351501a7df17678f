"""Partitioned-dataset sink: hive layout, file-size bounding, pruning."""

from __future__ import annotations

import glob
import os

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
