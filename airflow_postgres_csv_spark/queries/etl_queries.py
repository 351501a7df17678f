"""ETL operator surface as oracle-checked queries: a full export→import
round-trip through the engine's CSV path must reproduce the source table
exactly (the reference's core contract: COPY out must COPY back in,
operators.py:80 + 163-170).

The Spark side really writes and re-reads files (gzip, dialect options);
the DuckDB oracle is simply the source table — so any loss in the CSV path
(quoting, nulls, timestamps, float text round-trip) fails the hash.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.catalog import load
from airflow_postgres_csv_spark.operators import etl
from airflow_postgres_csv_spark.queries import register

_TMP_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".tmp")


def _tmp_path(name: str) -> str:
    os.makedirs(_TMP_ROOT, exist_ok=True)
    return os.path.join(_TMP_ROOT, f"{name}-{uuid.uuid4().hex[:8]}")


def csv_roundtrip_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → gzip CSV (header) → read back with schema → identical."""
    src = load(spark, sf_dir, "customer")
    path = _tmp_path("customer") + ".csv.gz"
    try:
        etl.df_to_csv(src, path, has_header=True, compression="gzip", single_file=True)
        back = etl.read_csv(spark, path, schema=src.schema).cache()
        back.count()  # materialize before the temp file disappears
    finally:
        if os.path.exists(path):
            os.remove(path)
    return back.orderBy("c_custkey")


register(
    "csv_roundtrip_customer",
    "SELECT * FROM customer ORDER BY c_custkey",
)(csv_roundtrip_customer)


def csv_roundtrip_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with NULLs through a hostile dialect: '|' delimiter, single
    quote char, 'NULL' null-string, no header, positional column mapping —
    every option of reference operators.py:129-133 in one pass."""
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif("o_orderstatus", F.lit("O")).alias("status_or_null"),
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("odate"),
    )
    path = _tmp_path("orders") + ".csv"
    try:
        etl.df_to_csv(
            src,
            path,
            has_header=False,
            delimiter="|",
            quote_char="'",
            null_string="NULL",
            single_file=True,
        )
        back = etl.read_csv(
            spark,
            path,
            schema="c0 bigint, c1 string, c2 double, c3 string",
            has_header=False,
            delimiter="|",
            quote_char="'",
            null_string="NULL",
            columns=["o_orderkey", "status_or_null", "o_totalprice", "odate"],
        ).cache()
        back.count()
    finally:
        if os.path.exists(path):
            os.remove(path)
    return back.orderBy("o_orderkey")


register(
    "csv_roundtrip_dialect",
    """
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate
    FROM orders ORDER BY o_orderkey
    """,
)(csv_roundtrip_dialect)


def csv_multifile_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalable export path: directory of part files written in
    parallel (one per partition), read back as one dataset. This is the
    100 TB-shaped contract — no coalesce(1) bottleneck."""
    src = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    out_dir = _tmp_path("lineitem_parts")
    try:
        etl.df_to_csv(src.repartition(8), out_dir, single_file=False)
        back = etl.read_csv(
            spark, out_dir, schema="l_orderkey bigint, l_linenumber int, l_quantity double, l_returnflag string"
        ).cache()
        back.count()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
        )
        .orderBy("l_returnflag")
    )


register(
    "csv_multifile_export",
    """
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)(csv_multifile_export)


def jsonl_roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → gzip JSONL → read back with schema → identical.

    JSONL is the corpus interchange format CSV can't be (lossless unicode
    text with embedded newlines/quotes, explicit nulls, nested types) —
    the round-trip proves the full fidelity of the path."""
    from airflow_postgres_csv_spark.operators import jsonl

    src = load(spark, sf_dir, "documents")
    path = _tmp_path("documents") + ".jsonl.gz"
    try:
        jsonl.df_to_jsonl(src, path, compression="gzip", single_file=True)
        back = jsonl.read_jsonl(spark, path, schema=src.schema).cache()
        back.count()
    finally:
        if os.path.exists(path):
            os.remove(path)
    return back.orderBy("doc_id")


register(
    "jsonl_roundtrip_documents",
    "SELECT * FROM documents ORDER BY doc_id",
)(jsonl_roundtrip_documents)


def orc_roundtrip_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → ORC directory (parallel parts) → read back → identical.

    ORC is the third columnar interchange format next to parquet/CSV/JSONL
    — native in Spark (predicate pushdown, column pruning, zlib/zstd),
    common in Hive-lineage warehouses. DuckDB can't read ORC, so the
    oracle is the source table itself: a lossless round trip must equal
    it bit-for-bit."""
    src = load(spark, sf_dir, "part")
    out_dir = _tmp_path("part_orc")
    try:
        src.write.mode("overwrite").orc(out_dir)
        back = spark.read.schema(src.schema).orc(out_dir).cache()
        back.count()  # materialize before the temp dir disappears
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return back.orderBy("p_partkey")


register(
    "orc_roundtrip_part",
    "SELECT * FROM part ORDER BY p_partkey",
)(orc_roundtrip_part)


def xml_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → XML (rowTag=nation, parallel parts) → read back → identical.

    Spark 4 ships the XML data source natively (the spark-xml lineage),
    which the reference's COPY-to-text world would cover with psql's text
    formats. DuckDB can't parse XML, so — like ORC — the oracle is the
    source table itself: a lossless round trip must equal it."""
    src = load(spark, sf_dir, "nation")
    out_dir = _tmp_path("nation_xml")
    try:
        src.write.mode("overwrite").option("rowTag", "nation").xml(out_dir)
        back = spark.read.option("rowTag", "nation").schema(src.schema).xml(out_dir).cache()
        back.count()  # materialize before the temp dir disappears
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return back.orderBy("n_nationkey")


register(
    "xml_roundtrip_nation",
    "SELECT * FROM nation ORDER BY n_nationkey",
)(xml_roundtrip_nation)


# ---------------------------------------------------------------------------
# Partitioned-dataset sink round-trip (operators/dataset.py): documents →
# Hive-partitioned parquet (lang=…/) → read back with a partition filter.
# The lang IN (…) predicate is satisfied by directory pruning alone — the
# de/serialization, partition-column restoration, and pruned-read path are
# what the oracle certifies (text integrity via md5). Plan-level pruning
# assertions live in tests/test_plans.py.
# ---------------------------------------------------------------------------


def dataset_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airflow_postgres_csv_spark.operators.dataset import write_partitioned_dataset

    src = load(spark, sf_dir, "documents")
    path = _tmp_path("docs_part")
    try:
        n = write_partitioned_dataset(
            src, path, partition_by=["lang"], sort_within=["doc_id"]
        )
        assert n == src.count()
        back = (
            spark.read.parquet(path)
            .filter(F.col("lang").isin("en", "fr"))
            .select("doc_id", "lang", "n_chars", F.md5("text").alias("text_md5"))
            .cache()
        )
        back.count()  # materialize before the temp dir disappears
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return back.orderBy("doc_id")


register(
    "dataset_partitioned_roundtrip",
    """
    SELECT doc_id, lang, n_chars, md5(text) AS text_md5
    FROM documents WHERE lang IN ('en', 'fr') ORDER BY doc_id
    """,
)(dataset_partitioned_roundtrip)


# ---------------------------------------------------------------------------
# Snapshot diff (operators/merge.py:table_diff): reconcile two versions of
# customer — removals (key % 97), updates (key % 10, acctbal bump), and
# inserts (key shifted past the keyspace for % 83) are synthesized
# deterministically from the fixture, diffed with the null-safe
# column-compare full-outer join, and the oracle rebuilds the same diff
# relationally.
# ---------------------------------------------------------------------------


def _etl_table_diff(spark, sf_dir):
    from airflow_postgres_csv_spark.operators.merge import table_diff

    old = load(spark, sf_dir, "customer")
    kept = old.filter(F.col("c_custkey") % 97 != 0)
    updated = kept.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 10 == 0,
            (F.col("c_acctbal").cast("decimal(18,2)") + 1000).cast("double"),
        ).otherwise(F.col("c_acctbal")),
    )
    inserts = old.filter(F.col("c_custkey") % 83 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + 1000000
    )
    new = updated.unionByName(inserts)
    return table_diff(old, new, keys=["c_custkey"]).orderBy(
        "c_custkey", "diff_status"
    )


register(
    "etl_table_diff",
    """
    WITH old AS (SELECT * FROM customer),
    kept AS (SELECT * FROM old WHERE c_custkey % 97 <> 0),
    updated AS (
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 10 = 0
                  THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 1000 AS DOUBLE)
                  ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM kept
    ),
    ins AS (
      SELECT c_custkey + 1000000 AS c_custkey, c_name, c_nationkey, c_acctbal,
             c_mktsegment
      FROM old WHERE c_custkey % 83 = 0
    ),
    new AS (SELECT * FROM updated UNION ALL SELECT * FROM ins),
    j AS (
      SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
             CASE WHEN o.c_custkey IS NULL THEN 'added'
                  WHEN n.c_custkey IS NULL THEN 'removed'
                  WHEN NOT (o.c_name IS NOT DISTINCT FROM n.c_name
                        AND o.c_nationkey IS NOT DISTINCT FROM n.c_nationkey
                        AND o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
                        AND o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment)
                       THEN 'changed'
             END AS diff_status
      FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    )
    SELECT c_custkey, diff_status FROM j WHERE diff_status IS NOT NULL
    ORDER BY c_custkey, diff_status
    """,
)(_etl_table_diff)
