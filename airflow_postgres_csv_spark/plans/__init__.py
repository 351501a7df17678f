"""Plan-level scale toolkit: introspection (pushdown/pruning/broadcast
assertions), skew salting, and bucketed co-located joins."""

from airflow_postgres_csv_spark.plans import bucketing, introspect, skew  # noqa: F401
