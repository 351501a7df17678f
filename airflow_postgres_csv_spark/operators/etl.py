"""ETL operators: query→CSV export and CSV→table import.

Spark-native re-expression of the reference package's two operators
(reference ``src/airflow_postgres_csv/operators.py``):

- ``PostgresToCsvOperator`` (operators.py:12-98): run SQL, stream the result
  to a CSV file (optional header, optional gzip) → :func:`query_to_csv`.
- ``CsvToPostgresOperator`` (operators.py:101-212): bulk-load a CSV file
  into a table with delimiter/quote/null-string/columns/truncate options →
  :func:`csv_to_table`.

Option-surface parity (reference file:line → here):
- ``sql`` may be a path ending in ``.sql`` → file contents (operators.py:39,
  63-67) — :func:`resolve_sql`.
- trailing-semicolon strip (operators.py:70) — :func:`resolve_sql`.
- dict parameter binding via ``cursor.mogrify`` (operators.py:46,77) →
  Spark named parameter markers ``:name`` (no string splicing).
- ``has_header`` (operators.py:47,79-80,132,161) → CSV ``header`` option.
- ``compression='gzip'`` (operators.py:48,96-98,135,210-212) → codec option
  on write; automatic ``.gz`` decompression on read.
- ``delimiter``/``quote_char``/``null_string`` (operators.py:129-131) →
  ``sep``/``quote``/``nullValue`` options.
- ``columns`` positional mapping + manual header skip (operators.py:133,
  160-161, 180-181, 204-208) → ``toDF(*columns)``.
- ``truncate`` (operators.py:116,175-177) → overwrite the managed table
  (or JDBC truncate-overwrite in operators/jdbc.py).
- missing-file validation (operators.py:153-154) → FileNotFoundError before
  the lazy Spark read.
- row-count / path returns for task chaining (operators.py:94,192).

Scale posture: the natural Spark output is a *directory* of part files —
one per task, written in parallel; that is what a 1000-executor job must
produce, and it is the DEFAULT (``single_file=False``). ``single_file=True``
reproduces the reference's one-file contract (coalesce(1) + rename) and is
the opt-in, non-scalable convenience. Rowcounts come from an ``Observation``
attached to the written plan — one scan per export, never a second
``count()`` execution of the source query.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "resolve_sql",
    "query_to_csv",
    "df_to_csv",
    "read_csv",
    "csv_to_table",
]

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def resolve_sql(sql: str, search_path: list[str] | tuple[str, ...] | None = None) -> str:
    """Reference semantics: ``.sql`` suffix → read file; strip trailing ';'.

    (reference operators.py:39, 63-67, 70)

    ``search_path``: directories a RELATIVE ``.sql`` path is resolved
    against, first hit wins — the engine-side analog of Airflow's DAG
    ``template_searchpath`` (the reference relies on Airflow's
    ``template_ext`` machinery for this; operators.py:39). An absolute
    path, or no ``search_path``, keeps the original open-as-given
    behavior. A relative path found in no search dir raises with every
    location tried.
    """
    if sql.strip().endswith(".sql"):
        path = sql.strip()
        if search_path and not os.path.isabs(path):
            tried = [os.path.join(d, path) for d in search_path]
            for cand in tried:
                if os.path.isfile(cand):
                    path = cand
                    break
            else:
                raise FileNotFoundError(
                    f"{path!r} not found on template search path; tried: {tried}"
                )
        with open(path, encoding="utf-8") as f:
            sql = f.read()
    return sql.strip().rstrip(";")


def query_to_csv(
    spark: SparkSession,
    sql: str,
    csv_path: str,
    parameters: dict | None = None,
    has_header: bool = True,
    compression: str | None = None,
    single_file: bool = False,
    delimiter: str = ",",
    quote_char: str = '"',
    null_string: str = "",
) -> tuple[str, int]:
    """Run ``sql`` and write the result to CSV. Returns ``(path, rowcount)``.

    The reference returns the CSV path and logs the rowcount
    (operators.py:86-94); we return both for pipeline chaining.
    ``parameters`` binds via Spark named markers (``:name``) — the safe
    equivalent of ``cursor.mogrify`` (operators.py:77).
    """
    df = spark.sql(resolve_sql(sql), args=parameters or {})
    return df_to_csv(
        df,
        csv_path,
        has_header=has_header,
        compression=compression,
        single_file=single_file,
        delimiter=delimiter,
        quote_char=quote_char,
        null_string=null_string,
    )


def df_to_csv(
    df: DataFrame,
    csv_path: str,
    has_header: bool = True,
    compression: str | None = None,
    single_file: bool = False,
    delimiter: str = ",",
    quote_char: str = '"',
    null_string: str = "",
) -> tuple[str, int]:
    """Write a DataFrame to CSV with the reference's option surface.

    The default writes a directory of part files — the scalable path
    (every executor writes its partition in parallel; Spark's CSV reader
    consumes the directory transparently). ``single_file=True`` mirrors
    the reference's exactly-one-file contract via coalesce(1); fine for
    exports that fit one machine, not for 100 TB.

    The returned rowcount is observed on the write pass itself
    (``df.observe``) — the source plan executes exactly once, and the
    count always describes the rows actually written (a re-run of a
    non-deterministic query could disagree).
    """
    if compression not in (None, "gzip"):
        raise ValueError(f"unsupported compression: {compression!r}")
    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows_written"))
    out_df = observed.coalesce(1) if single_file else observed
    tmp_dir = csv_path + "._spark_tmp" if single_file else csv_path
    writer = (
        out_df.write.mode("overwrite")
        .option("header", str(has_header).lower())
        .option("sep", delimiter)
        .option("quote", quote_char)
        .option("nullValue", null_string)
        .option("emptyValue", null_string)
        .option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_FMT)
    )
    if compression == "gzip":
        writer = writer.option("compression", "gzip")
    writer.csv(tmp_dir)
    n = int(obs.get["rows_written"])
    if single_file:
        ext = ".csv.gz" if compression == "gzip" else ".csv"
        parts = glob.glob(os.path.join(tmp_dir, "part-*"))
        if len(parts) != 1:  # pragma: no cover - coalesce(1) guarantees one
            raise RuntimeError(f"expected one part file, found {parts}")
        if os.path.exists(csv_path):
            os.remove(csv_path)
        shutil.move(parts[0], csv_path)
        shutil.rmtree(tmp_dir)
        _ = ext  # extension is the caller's choice; we honor csv_path as-is
    return csv_path, n


def read_csv(
    spark: SparkSession,
    csv_path: str,
    schema=None,
    has_header: bool = True,
    delimiter: str = ",",
    quote_char: str = '"',
    null_string: str = "",
    columns: list[str] | None = None,
    multiline: bool = False,
    mode: str = "PERMISSIVE",
):
    """Read a CSV (optionally gzipped — inferred from ``.gz`` extension)
    with the reference's dialect options (operators.py:129-135).

    ``columns`` reproduces the positional column-list mapping
    (operators.py:133, 204-208): names are assigned by position. When the
    file also has a header row it is skipped, not trusted
    (operators.py:161, 180-181).

    ``mode`` controls malformed-record handling (only meaningful with an
    explicit ``schema``): ``"PERMISSIVE"`` (default — unparseable cells
    become NULL), ``"DROPMALFORMED"`` (skip bad records), ``"FAILFAST"``
    (raise on the first bad record — Postgres COPY's behavior, so pass
    this for strict reference parity). At 100 TB prefer PERMISSIVE plus a
    downstream NULL-audit over FAILFAST: one bad record a terabyte deep
    should quarantine a row, not kill a ten-hour load.

    ``multiline=True`` parses quoted fields containing embedded newlines
    (record separators inside quotes), matching Postgres COPY CSV
    semantics. Scale tradeoff: multiline files are NOT splittable — Spark
    must parse each file in a single task because record boundaries can't
    be found mid-file — so at 100 TB keep it off (the default) unless the
    data truly embeds newlines, and then shard into many small files
    (same playbook as gzip).

    Known divergence from Postgres COPY (pinned in
    tests/test_etl_property.py): with a whitespace delimiter (tab) and an
    empty null marker, an all-NULL row serializes to a whitespace-only
    line, which Spark's CSV reader skips as blank.
    """
    if not os.path.exists(csv_path):
        raise FileNotFoundError(f"CSV file not found: {csv_path}")
    reader = (
        spark.read.option("header", str(has_header).lower())
        .option("sep", delimiter)
        .option("quote", quote_char)
        .option("nullValue", null_string)
        .option("emptyValue", null_string)
        .option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_FMT)
        .option("multiLine", str(multiline).lower())
        .option("mode", mode)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(csv_path)
    if columns is not None:
        if len(columns) != len(df.columns):
            raise ValueError(
                f"columns has {len(columns)} names but CSV has {len(df.columns)} fields"
            )
        df = df.toDF(*columns)
    return df


def csv_to_table(
    spark: SparkSession,
    csv_path: str,
    table_name: str,
    schema=None,
    delimiter: str = ",",
    quote_char: str = '"',
    null_string: str = "",
    has_header: bool = True,
    columns: list[str] | None = None,
    truncate: bool = False,
    multiline: bool = False,
) -> int:
    """Bulk-load a CSV file into a Spark-managed table; returns rowcount.

    Mirrors ``CsvToPostgresOperator.execute`` (operators.py:152-192):
    validate file → read with dialect options → optional positional column
    mapping → TRUNCATE-equivalent (overwrite keeping schema) or append.
    The JDBC variant for a real PostgreSQL sink is
    :func:`airflow_postgres_csv_spark.operators.jdbc.csv_to_postgres`.
    """
    df = read_csv(
        spark,
        csv_path,
        schema=schema,
        has_header=has_header,
        delimiter=delimiter,
        quote_char=quote_char,
        null_string=null_string,
        columns=columns,
        multiline=multiline,
    )
    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows_written"))
    mode = "overwrite" if truncate else "append"
    observed.write.mode(mode).saveAsTable(table_name)
    return int(obs.get["rows_written"])
