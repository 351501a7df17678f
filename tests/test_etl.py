"""Unit tests for the ETL operator surface — mirrors the reference's test
strategy (reference tests/test_operators.py): option permutations, gzip
round-trips, .sql file loading, missing-file errors, column mapping.
"""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import Row

from airflow_postgres_csv_spark.catalog import load
from airflow_postgres_csv_spark.operators import etl


@pytest.fixture()
def small_df(spark):
    return spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=2, b=None), Row(a=3, b="with,comma")]
    )


def test_export_header_and_content(spark, small_df, tmp_out):
    path = os.path.join(tmp_out, "out.csv")
    out_path, n = etl.df_to_csv(small_df, path, has_header=True, single_file=True)
    assert out_path == path and n == 3
    lines = open(path).read().splitlines()
    assert lines[0] == "a,b"
    assert len(lines) == 4
    assert '"with,comma"' in lines[3]


def test_export_no_header(spark, small_df, tmp_out):
    path = os.path.join(tmp_out, "nh.csv")
    etl.df_to_csv(small_df, path, has_header=False, single_file=True)
    lines = open(path).read().splitlines()
    assert lines[0] != "a,b" and len(lines) == 3


def test_export_gzip_roundtrip(spark, small_df, tmp_out):
    """Reference test_operators.py:89-102 — gzip export is decompressible."""
    path = os.path.join(tmp_out, "out.csv.gz")
    etl.df_to_csv(small_df, path, compression="gzip", single_file=True)
    with gzip.open(path, "rt") as f:
        lines = f.read().splitlines()
    assert lines[0] == "a,b" and len(lines) == 4
    # and the engine reads it back transparently (.gz inferred)
    back = etl.read_csv(spark, path, schema="a bigint, b string")
    assert back.count() == 3


def test_export_bad_compression(spark, small_df, tmp_out):
    with pytest.raises(ValueError, match="unsupported compression"):
        etl.df_to_csv(small_df, os.path.join(tmp_out, "x.csv"), compression="zstd")


def test_sql_file_loading(spark, sf_dir, tmp_out):
    """Reference test_operators.py:47-62 — sql ending in .sql reads the file."""
    load(spark, sf_dir, "region").createOrReplaceTempView("region")
    sql_file = os.path.join(tmp_out, "q.sql")
    with open(sql_file, "w") as f:
        f.write("SELECT r_regionkey FROM region;")
    path, n = etl.query_to_csv(spark, sql_file, os.path.join(tmp_out, "r.csv"))
    assert n == 5


def test_semicolon_strip():
    """Reference test_operators.py:64-74."""
    assert etl.resolve_sql("SELECT 1;  ") == "SELECT 1"
    assert etl.resolve_sql("SELECT 1") == "SELECT 1"


def test_parameter_binding(spark, sf_dir, tmp_out):
    """Reference operators.py:77 mogrify → Spark named markers."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    path, n = etl.query_to_csv(
        spark,
        "SELECT n_name FROM nation WHERE n_regionkey = :rk",
        os.path.join(tmp_out, "n.csv"),
        parameters={"rk": 1},
    )
    assert n > 0


def test_import_missing_file(spark):
    """Reference test_operators.py:106-114."""
    with pytest.raises(FileNotFoundError, match="CSV file not found"):
        etl.read_csv(spark, "/nonexistent/file.csv")


def test_dialect_options_roundtrip(spark, tmp_out):
    """delimiter/quote/null options (reference operators.py:129-131)."""
    df = spark.createDataFrame([Row(a=1, b="x'y"), Row(a=2, b=None)])
    path = os.path.join(tmp_out, "d.csv")
    etl.df_to_csv(df, path, delimiter="|", quote_char="'", null_string="NULLY", single_file=True)
    raw = open(path).read()
    assert "a|b" in raw and "NULLY" in raw
    back = etl.read_csv(
        spark, path, schema="a bigint, b string",
        delimiter="|", quote_char="'", null_string="NULLY",
    ).collect()
    assert {r.a: r.b for r in back} == {1: "x'y", 2: None}


def test_columns_positional_mapping(spark, tmp_out):
    """Reference test_operators.py:149-163 — explicit columns rename by
    position and the header row is skipped, not trusted."""
    path = os.path.join(tmp_out, "c.csv")
    with open(path, "w") as f:
        f.write("col_a,col_b\n1,2\n3,4\n")
    df = etl.read_csv(
        spark, path, schema="x bigint, y bigint", columns=["renamed_a", "renamed_b"]
    )
    assert df.columns == ["renamed_a", "renamed_b"]
    assert df.count() == 2


def test_columns_arity_mismatch(spark, tmp_out):
    path = os.path.join(tmp_out, "c2.csv")
    with open(path, "w") as f:
        f.write("a,b\n1,2\n")
    with pytest.raises(ValueError, match="columns has"):
        etl.read_csv(spark, path, schema="x bigint, y bigint", columns=["only_one"])


def test_csv_to_table_truncate_vs_append(spark, tmp_out):
    """Reference test_operators.py:165-180 — truncate empties before load."""
    path = os.path.join(tmp_out, "t.csv")
    with open(path, "w") as f:
        f.write("a,b\n1,x\n2,y\n")
    spark.sql("DROP TABLE IF EXISTS etl_t")
    n1 = etl.csv_to_table(spark, path, "etl_t", schema="a bigint, b string")
    n2 = etl.csv_to_table(spark, path, "etl_t", schema="a bigint, b string")
    assert (n1, n2) == (2, 2)
    assert spark.table("etl_t").count() == 4  # append twice
    n3 = etl.csv_to_table(spark, path, "etl_t", schema="a bigint, b string", truncate=True)
    assert n3 == 2 and spark.table("etl_t").count() == 2
    spark.sql("DROP TABLE etl_t")


def test_timestamp_roundtrip(spark, sf_dir, tmp_out):
    """Timestamps survive CSV export→import bit-exactly (micros)."""
    orders = load(spark, sf_dir, "orders").limit(50)
    path = os.path.join(tmp_out, "o.csv")
    etl.df_to_csv(orders, path)
    back = etl.read_csv(spark, path, schema=orders.schema)
    a = {r.o_orderkey: r.o_orderdate for r in orders.collect()}
    b = {r.o_orderkey: r.o_orderdate for r in back.collect()}
    assert a == b


def test_parallel_default_writes_directory_with_observed_count(spark, small_df, tmp_out):
    """The default export path is the scalable one: a directory of part
    files written in parallel, with the rowcount observed on the write
    pass itself (no second execution of the source plan)."""
    out_dir = os.path.join(tmp_out, "parts_out")
    path, n = etl.df_to_csv(small_df.repartition(4), out_dir)
    assert path == out_dir and n == 3
    assert os.path.isdir(out_dir)
    parts = [f for f in os.listdir(out_dir) if f.startswith("part-")]
    assert len(parts) >= 1
    back = etl.read_csv(spark, out_dir, schema="a bigint, b string")
    assert back.count() == 3


def test_observed_count_empty_result(spark, small_df, tmp_out):
    """Zero-row exports still report an observed count of 0 (the
    Observation fires when the write finishes, rows or not)."""
    out_dir = os.path.join(tmp_out, "empty_out")
    _, n = etl.df_to_csv(small_df.filter("a > 100"), out_dir)
    assert n == 0


def test_multiline_quoted_newline_roundtrip(spark, tmp_out):
    # Postgres COPY CSV parses quoted fields containing record separators;
    # multiline=True reproduces that (at the cost of file splittability —
    # documented in read_csv). Default multiline=False mis-parses the
    # second physical line as a new record.
    df = spark.createDataFrame(
        [(1, "plain"), (2, "line one\nline two"), (3, "tail")],
        "id long, txt string",
    )
    path = os.path.join(tmp_out, "ml.csv")
    etl.df_to_csv(df, path, single_file=True)
    back = etl.read_csv(
        spark,
        path,
        schema="id long, txt string",
        multiline=True,
    )
    got = {r.id: r.txt for r in back.collect()}
    assert got == {1: "plain", 2: "line one\nline two", 3: "tail"}

    flat = etl.read_csv(spark, path, schema="id long, txt string")
    assert flat.count() != 3  # the divergence multiline=True exists to fix


def test_malformed_record_modes(spark, tmp_out):
    # COPY-parity strictness is FAILFAST; PERMISSIVE nulls the bad cell;
    # DROPMALFORMED skips the record entirely.
    bad_csv = os.path.join(tmp_out, "bad.csv")
    with open(bad_csv, "w") as f:
        f.write("id,v\n1,10\n2,notanumber\n3,30\n")
    schema = "id long, v long"

    perm = etl.read_csv(spark, bad_csv, schema=schema).collect()
    assert {(r.id, r.v) for r in perm} == {(1, 10), (2, None), (3, 30)}

    dropped = etl.read_csv(
        spark, bad_csv, schema=schema, mode="DROPMALFORMED"
    ).collect()
    assert {(r.id, r.v) for r in dropped} == {(1, 10), (3, 30)}

    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        etl.read_csv(spark, bad_csv, schema=schema, mode="FAILFAST").collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)
