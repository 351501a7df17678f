"""JDBC source/sink: the PostgreSQL side of the reference's two operators.

The reference talks to PostgreSQL over libpq ``COPY`` (operators.py:80,
163-170). Spark's native equivalent is the JDBC data source: partitioned
parallel reads (each executor opens its own connection for a key-range
slice) and batched parallel writes — the distributed analog of "maximum
throughput" bulk transfer (reference README.md:16).

No PostgreSQL server or JDBC driver jar ships in this environment, so these
functions are written as thin, *pure* option-builders around
``spark.read.format("jdbc")`` / ``df.write.format("jdbc")`` — unit tests
assert the generated options and SQL strings, exactly the strategy the
reference's own fully-mocked tests use (tests/test_operators.py:12-31).
The ``driver`` parameter swaps the JDBC driver class; tests/test_jdbc.py
additionally runs the full write→read→truncate path end-to-end against
embedded Apache Derby (the one JDBC engine shipped inside Spark), so the
write path executes against a real database, not only against mocks.

Semantic notes vs the reference:
- Reference truncate+load is one transaction (operators.py:172-184). Spark
  JDBC commits per partition; :func:`atomic_load_plan` provides the
  staging-table + swap pattern that restores atomicity at any scale.
- ``timeout`` minutes → ``queryTimeout`` seconds (operators.py:49,76,174).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "quote_identifier",
    "read_options",
    "write_options",
    "jdbc_read",
    "jdbc_write",
    "postgres_to_csv",
    "csv_to_postgres",
    "atomic_load_plan",
]


def quote_identifier(name: str) -> str:
    """Quote a (possibly schema-qualified) SQL identifier.

    Reference semantics (operators.py:194-208): split on '.', double-quote
    each part, escape embedded double quotes by doubling them.
    """
    return ".".join('"' + part.replace('"', '""') + '"' for part in name.split("."))


def read_options(
    url: str,
    sql: str | None = None,
    table: str | None = None,
    parameters: dict | None = None,
    timeout_minutes: int = 60,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    driver: str = "org.postgresql.Driver",
) -> dict[str, str]:
    """Build the option dict for a JDBC read.

    Exactly one of ``sql``/``table``. A ``sql`` query is pushed down
    server-side via the ``query`` option — the Spark analog of the
    reference wrapping user SQL in ``COPY (…) TO STDOUT``
    (operators.py:79-80): the database executes the query, Spark streams
    the result. Partitioned reads (`partition_column` + bounds + n) give
    cluster-parallel ingestion — the 100 TB path the single libpq socket
    of the reference cannot take.
    """
    if (sql is None) == (table is None):
        raise ValueError("provide exactly one of sql or table")
    from airflow_postgres_csv_spark.operators.etl import resolve_sql

    opts: dict[str, str] = {
        "url": url,
        "driver": driver,
        "queryTimeout": str(timeout_minutes * 60),
        "fetchsize": str(fetchsize),
    }
    if sql is not None:
        opts["query"] = _bind_parameters(resolve_sql(sql), parameters)
    else:
        opts["dbtable"] = quote_identifier(table)
    if partition_column is not None:
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs bounds and num_partitions")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def _bind_parameters(sql: str, parameters: dict | None) -> str:
    """Bind ``%(name)s``-style parameters (reference README.md:33-34).

    Values are rendered as SQL literals with single-quote escaping — the
    JDBC ``query`` option cannot carry bind variables, so this mirrors what
    ``cursor.mogrify`` produced (operators.py:77). Numeric types pass
    through unquoted; everything else is quoted and escaped.

    Only ``%(name)s`` tokens are substituted (via regex, not Python's ``%``
    operator), so literal percent signs elsewhere in the SQL — ``LIKE
    '%x%'``, modulo, ``to_char`` format masks — pass through untouched and
    need no ``%%`` doubling. Non-finite floats are rejected: ``repr(inf)``
    is not SQL.
    """
    if not parameters:
        return sql
    rendered: dict[str, str] = {}
    for k, v in parameters.items():
        if v is None:
            rendered[k] = "NULL"
        elif isinstance(v, bool):
            rendered[k] = "TRUE" if v else "FALSE"
        elif isinstance(v, float) and not math.isfinite(v):
            raise ValueError(f"parameter {k!r} is non-finite ({v}): not a SQL literal")
        elif isinstance(v, (int, float)):
            rendered[k] = repr(v)
        else:
            rendered[k] = "'" + str(v).replace("'", "''") + "'"

    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in rendered:
            raise KeyError(f"SQL references parameter {name!r} but it was not supplied")
        return rendered[name]

    return re.sub(r"%\((\w+)\)s", sub, sql)


def write_options(
    url: str,
    table: str,
    truncate: bool = False,
    timeout_minutes: int = 60,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    driver: str = "org.postgresql.Driver",
) -> tuple[str, dict[str, str]]:
    """Build (mode, options) for a JDBC write.

    ``truncate=True`` → mode=overwrite with the JDBC ``truncate`` option so
    the table is TRUNCATEd (DDL preserved) rather than dropped — matching
    the reference's TRUNCATE-then-COPY (operators.py:175-177). Otherwise
    append. NOTE: commits happen per partition, not in one transaction —
    use :func:`atomic_load_plan` when the reference's single-transaction
    semantics (operators.py:184) matter.
    """
    opts = {
        "url": url,
        "driver": driver,
        "dbtable": quote_identifier(table),
        "queryTimeout": str(timeout_minutes * 60),
        "batchsize": str(batchsize),
        "truncate": str(truncate).lower(),
    }
    if num_partitions is not None:
        opts["numPartitions"] = str(num_partitions)
    return ("overwrite" if truncate else "append"), opts


def jdbc_read(spark: SparkSession, **kwargs) -> DataFrame:
    """``spark.read.format("jdbc")`` with :func:`read_options`."""
    return spark.read.format("jdbc").options(**read_options(**kwargs)).load()


def jdbc_write(df: DataFrame, **kwargs) -> None:
    """``df.write.format("jdbc")`` with :func:`write_options`."""
    mode, opts = write_options(**kwargs)
    df.write.format("jdbc").options(**opts).mode(mode).save()


def postgres_to_csv(
    spark: SparkSession,
    url: str,
    sql: str,
    csv_file_path: str,
    parameters: dict | None = None,
    has_header: bool = True,
    compression: str | None = None,
    timeout: int = 60,
    **read_kwargs,
) -> tuple[str, int]:
    """Composite operator #1: Postgres query → local CSV.

    Signature mirrors ``PostgresToCsvOperator.__init__``
    (operators.py:41-59): returns ``(csv_file_path, rowcount)``.

    ``timeout`` guards BOTH halves of the statement, like the reference's
    ``SET statement_timeout`` (operators.py:49,76): server-side via JDBC
    ``queryTimeout``, and Spark-side via a job-group cancel watchdog over
    the read+write jobs.
    """
    from airflow_postgres_csv_spark.operators.etl import df_to_csv
    from airflow_postgres_csv_spark.operators.timeout import statement_timeout

    df = jdbc_read(
        spark, url=url, sql=sql, parameters=parameters, timeout_minutes=timeout, **read_kwargs
    )
    # single_file=True: the reference's contract is exactly one CSV file
    # at csv_file_path (operators.py:86-94); callers wanting the scalable
    # directory-of-parts export use df_to_csv directly with its default.
    with statement_timeout(spark, timeout, "postgres_to_csv"):
        return df_to_csv(
            df, csv_file_path, has_header=has_header, compression=compression, single_file=True
        )


def csv_to_postgres(
    spark: SparkSession,
    url: str,
    table_name: str,
    csv_file_path: str,
    delimiter: str = ",",
    quote_char: str = '"',
    null_string: str = "",
    has_header: bool = True,
    columns: list[str] | None = None,
    truncate: bool = False,
    timeout: int = 60,
    schema=None,
    batchsize: int = 10_000,
    driver: str = "org.postgresql.Driver",
) -> int:
    """Composite operator #2: local CSV → Postgres table.

    Signature mirrors ``CsvToPostgresOperator.__init__``
    (operators.py:124-150); returns the loaded rowcount (operators.py:192).

    ``timeout`` guards the whole load Spark-side (job-group cancel
    watchdog) in addition to the per-statement JDBC ``queryTimeout`` —
    the parity path for the reference's ``SET statement_timeout``
    (operators.py:174).
    """
    from airflow_postgres_csv_spark.operators.etl import read_csv
    from airflow_postgres_csv_spark.operators.timeout import statement_timeout

    df = read_csv(
        spark,
        csv_file_path,
        schema=schema,
        has_header=has_header,
        delimiter=delimiter,
        quote_char=quote_char,
        null_string=null_string,
        columns=columns,
    )
    with statement_timeout(spark, timeout, "csv_to_postgres"):
        n = df.count()
        jdbc_write(
            df,
            url=url,
            table=table_name,
            truncate=truncate,
            timeout_minutes=timeout,
            batchsize=batchsize,
            driver=driver,
        )
    return n


@dataclass(frozen=True)
class AtomicLoadPlan:
    """The staging-table + swap recipe restoring single-transaction
    truncate+load semantics (reference operators.py:172-184) on top of
    Spark JDBC's per-partition commits."""

    staging_table: str
    load_mode: str
    swap_sql: list[str] = field(default_factory=list)


def atomic_load_plan(table: str, staging_suffix: str = "_spark_staging") -> AtomicLoadPlan:
    """Plan an atomic load: write to staging, then swap in one transaction.

    The swap SQL is executed by any SQL runner with a single connection
    (psycopg2, JDBC statement); Spark does the heavy parallel write into
    the staging table, the 2-statement transaction provides atomicity.
    """
    staging = table + staging_suffix
    q = quote_identifier
    return AtomicLoadPlan(
        staging_table=staging,
        load_mode="overwrite",
        swap_sql=[
            "BEGIN",
            f"TRUNCATE {q(table)}",
            f"INSERT INTO {q(table)} SELECT * FROM {q(staging)}",
            f"DROP TABLE {q(staging)}",
            "COMMIT",
        ],
    )
