"""Drop-in operator classes matching the reference's literal Airflow API.

The reference's users instantiate ``PostgresToCsvOperator(conn_id=…,
sql=…, csv_file_path=…)`` / ``CsvToPostgresOperator(conn_id=…,
table_name=…, csv_file_path=…)`` inside a DAG (reference
src/airflow_postgres_csv/operators.py:12-39, 101-150; README.md:26-46).
These shims expose the same class names, constructor signatures,
``template_fields`` and ``execute(context)`` return values, delegating the
work to the Spark-native composite operators
(:func:`airflow_postgres_csv_spark.operators.jdbc.postgres_to_csv` /
:func:`~.jdbc.csv_to_postgres`).

If ``apache-airflow`` is importable the classes subclass the real
``BaseOperator`` so they schedule inside a DAG unchanged; otherwise a
minimal stand-in provides the ``log`` attribute and ``**kwargs``
tolerance so the classes work as plain Python callables (the mode this
repo tests). Connection resolution: Airflow's ``conn_id`` indirection is
replaced by :func:`register_connection` (explicit map) — or pass a JDBC
URL directly as ``conn_id``.
"""

from __future__ import annotations

import logging
from collections.abc import Sequence

try:  # pragma: no cover - airflow not installed in the test environment
    from airflow.sdk.bases.operator import BaseOperator  # type: ignore
except Exception:  # pragma: no cover
    try:
        from airflow.models import BaseOperator  # type: ignore
    except Exception:

        class BaseOperator:  # type: ignore[no-redef]
            """Minimal stand-in: accepts/ignores BaseOperator kwargs
            (task_id, dag, …) and provides ``self.log``."""

            def __init__(self, **kwargs):
                self.task_id = kwargs.get("task_id")
                self.log = logging.getLogger(type(self).__name__)


__all__ = [
    "PostgresToCsvOperator",
    "CsvToPostgresOperator",
    "register_connection",
]

_CONNECTIONS: dict[str, dict] = {}


def register_connection(conn_id: str, url: str, driver: str | None = None) -> None:
    """Map an Airflow-style ``conn_id`` to a JDBC url (+ optional driver
    class). The engine-native replacement for Airflow's connection store."""
    _CONNECTIONS[conn_id] = {"url": url, **({"driver": driver} if driver else {})}


def _resolve(conn_id: str) -> dict:
    if conn_id in _CONNECTIONS:
        return _CONNECTIONS[conn_id]
    if conn_id.startswith("jdbc:"):
        return {"url": conn_id}
    raise KeyError(
        f"unknown conn_id {conn_id!r}: call register_connection() or pass a jdbc: URL"
    )


def _active_spark():
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from airflow_postgres_csv_spark.session import get_spark

        spark = get_spark()
    return spark


def _render_template_fields(op, context: dict | None) -> dict[str, str]:
    """Render each string attr named in ``template_fields`` with Jinja
    against ``context`` — the reference's main UX (its operators declare
    ``template_fields = ("sql", "csv_file_path")`` etc., reference
    operators.py:35-39,122, and Airflow renders ``{{ ds }}``-style values
    before ``execute``). Outside a real Airflow DAG run nothing performs
    that render, so the shim does it itself at execute() time.

    Jinja2 (a hard dependency of Airflow itself) is used when importable;
    otherwise fields pass through unchanged — matching no-context
    behavior. A ``.sql``-suffixed value renders as a path string here
    (e.g. ``/data/{{ ds }}/q.sql``); its file contents are resolved later
    by resolve_sql. (Airflow's ``template_ext`` content-rendering of the
    file body itself is not reproduced — that requires a full DAG
    template environment.)
    """
    out: dict[str, str] = {}
    for fld in getattr(op, "template_fields", ()):  # pragma: no branch
        val = getattr(op, fld, None)
        out[fld] = val
        if not context or not isinstance(val, str) or "{{" not in val:
            continue
        try:
            import jinja2
        except ImportError:  # pragma: no cover - jinja2 ships with airflow
            continue
        out[fld] = jinja2.Template(val, undefined=jinja2.StrictUndefined).render(
            **context
        )
    return out


def _searchpath(op, context: dict | None) -> tuple[str, ...] | None:
    """Directories relative ``.sql`` paths resolve against: the operator's
    own ``template_searchpath`` plus the DAG's (Airflow declares it at the
    DAG level — ``context['dag'].template_searchpath`` — the shim accepts
    both so it works with and without a real DAG run)."""
    dirs: list[str] = []
    own = getattr(op, "template_searchpath", None)
    if own:
        dirs.extend([own] if isinstance(own, str) else own)
    dag = (context or {}).get("dag")
    dag_sp = getattr(dag, "template_searchpath", None)
    if dag_sp:
        dirs.extend([dag_sp] if isinstance(dag_sp, str) else dag_sp)
    return tuple(dirs) or None


class PostgresToCsvOperator(BaseOperator):
    """Execute SQL against the database behind ``conn_id`` and save the
    result as a CSV file. Mirrors reference operators.py:12-98: same
    constructor, same ``template_fields``, ``execute`` returns the CSV
    path. The bulk transport is Spark's partitioned JDBC read + parallel
    CSV write instead of a single libpq ``COPY`` socket.
    """

    template_fields: Sequence[str] = ("sql", "csv_file_path")
    template_ext: Sequence[str] = (".sql",)

    def __init__(
        self,
        conn_id: str,
        csv_file_path: str,
        sql: str,
        parameters: dict | None = None,
        has_header: bool = True,
        compression: str | None = None,
        timeout: int = 60,
        template_searchpath: str | Sequence[str] | None = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.conn_id = conn_id
        self.csv_file_path = csv_file_path
        self.sql = sql
        self.parameters = parameters or {}
        self.has_header = has_header
        self.compression = compression
        self.timeout = timeout
        self.template_searchpath = template_searchpath

    def execute(self, context=None):
        from airflow_postgres_csv_spark.operators.etl import resolve_sql
        from airflow_postgres_csv_spark.operators.jdbc import postgres_to_csv

        rendered = _render_template_fields(self, context)
        sql = rendered["sql"]
        sp = _searchpath(self, context)
        if sp and sql.strip().endswith(".sql"):
            # resolve the relative .sql against the search path here (the
            # downstream resolver has no DAG context); the result is the
            # file's SQL text, which passes through resolve_sql unchanged
            sql = resolve_sql(sql, search_path=sp)
        path, rows = postgres_to_csv(
            _active_spark(),
            sql=sql,
            csv_file_path=rendered["csv_file_path"],
            parameters=self.parameters,
            has_header=self.has_header,
            compression=self.compression,
            timeout=self.timeout,
            **_resolve(self.conn_id),
        )
        self.log.info("CSV saved: %s (%s rows)", path, rows)
        return path


class CsvToPostgresOperator(BaseOperator):
    """Load a CSV file into a table in the database behind ``conn_id``.
    Mirrors reference operators.py:101-212: same constructor and
    ``template_fields``; ``execute`` returns the loaded rowcount. The bulk
    transport is Spark's batched parallel JDBC write.

    ``compression`` parity note: gzip input is auto-decompressed from the
    ``.gz`` extension (Spark codec inference); passing ``compression=
    'gzip'`` for a path without ``.gz`` raises, rather than silently
    loading compressed bytes.
    """

    template_fields: Sequence[str] = ("csv_file_path", "table_name")

    def __init__(
        self,
        conn_id: str,
        table_name: str,
        csv_file_path: str,
        delimiter: str = ",",
        quote_char: str = '"',
        null_string: str = "",
        has_header: bool = True,
        columns: list[str] | None = None,
        truncate: bool = False,
        compression: str | None = None,
        timeout: int = 60,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.conn_id = conn_id
        self.table_name = table_name
        self.csv_file_path = csv_file_path
        self.delimiter = delimiter
        self.quote_char = quote_char
        self.null_string = null_string
        self.has_header = has_header
        self.columns = columns
        self.truncate = truncate
        self.compression = compression
        self.timeout = timeout

    def execute(self, context=None):
        from airflow_postgres_csv_spark.operators.jdbc import csv_to_postgres

        rendered = _render_template_fields(self, context)
        if self.compression == "gzip" and not rendered["csv_file_path"].endswith(".gz"):
            raise ValueError(
                "gzip input must use a .gz extension (Spark infers the codec "
                f"from the filename): {rendered['csv_file_path']!r}"
            )
        rows = csv_to_postgres(
            _active_spark(),
            table_name=rendered["table_name"],
            csv_file_path=rendered["csv_file_path"],
            delimiter=self.delimiter,
            quote_char=self.quote_char,
            null_string=self.null_string,
            has_header=self.has_header,
            columns=self.columns,
            truncate=self.truncate,
            timeout=self.timeout,
            **_resolve(self.conn_id),
        )
        self.log.info("Loaded %s rows into %s", rows, self.table_name)
        return rows
