"""airflow_postgres_csv_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of
``Redevil10/airflow-postgres-csv`` (an Airflow operator package that moves
data between PostgreSQL and CSV via ``COPY``; see reference
``src/airflow_postgres_csv/operators.py:12-212``) as an idiomatic Spark
engine:

- ETL operator parity (query→CSV export, CSV→table import, with the full
  option surface: header/delimiter/quote/null-string/gzip/columns/truncate)
  in :mod:`airflow_postgres_csv_spark.operators.etl` and
  :mod:`airflow_postgres_csv_spark.operators.jdbc`.
- The delegated SQL surface (anything a user could put in the reference's
  ``sql`` parameter) served natively by Spark SQL / Catalyst — exercised by
  the query corpus in :mod:`airflow_postgres_csv_spark.queries`.
- LLM-data-pipeline extensions designed for 100 TB scale: deduplication,
  similarity search, text analysis, multimodal columns, streaming.

Everything is DataFrame-first: declare the logical plan, let Catalyst and
AQE pick the physical strategy. Python UDFs only where built-ins genuinely
cannot express the semantics (and then Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"

from airflow_postgres_csv_spark.session import get_spark  # noqa: F401
