"""Spark-side statement-timeout guard (reference parity: SET
statement_timeout, reference operators.py:49,76,174 — the Spark half that
JDBC queryTimeout cannot cover)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.timeout import (
    QueryTimeoutError,
    statement_timeout,
)


def _slow_sum(spark, seconds_per_row: float = 0.5, rows: int = 120) -> int:
    # one partition, sleeping UDF → a job that runs ~rows*seconds and is
    # only stoppable by cancellation. The aggregate CONSUMES the UDF
    # column — a bare count() would let Catalyst prune the UDF (and the
    # sleep) right out of the plan.
    sleep = F.udf(lambda x: (time.sleep(seconds_per_row), x)[1], "long")
    return (
        spark.range(rows)
        .coalesce(1)
        .select(sleep("id").alias("slow_id"))
        .agg(F.sum("slow_id"))
        .collect()[0][0]
    )


def test_timeout_cancels_runaway_job(spark):
    t0 = time.time()
    with pytest.raises(QueryTimeoutError):
        with statement_timeout(spark, timeout_minutes=2 / 60, description="slow"):
            _slow_sum(spark)
    # cancelled near the 2 s deadline, nowhere near the ~60 s full runtime
    assert time.time() - t0 < 30


def test_timeout_noop_for_fast_query(spark):
    with statement_timeout(spark, timeout_minutes=5, description="fast"):
        assert spark.range(100).count() == 100


def test_timeout_does_not_mask_real_errors(spark):
    with pytest.raises(Exception) as ei:
        with statement_timeout(spark, timeout_minutes=5, description="bad"):
            spark.sql("SELECT * FROM nonexistent_table_xyz").count()
    assert not isinstance(ei.value, QueryTimeoutError)


def test_nested_guards_restore_outer_group(spark):
    """Exiting an inner guard must restore the enclosing guard's job group
    (not wipe it to None), so the outer watchdog can still cancel jobs
    submitted after the inner block (ADVICE r3)."""
    sc = spark.sparkContext
    with statement_timeout(spark, 10.0, "outer"):
        outer_group = sc.getLocalProperty("spark.jobGroup.id")
        assert outer_group and outer_group.startswith("stmt_timeout_")
        with statement_timeout(spark, 10.0, "inner"):
            inner_group = sc.getLocalProperty("spark.jobGroup.id")
            assert inner_group != outer_group
        assert sc.getLocalProperty("spark.jobGroup.id") == outer_group
        assert sc.getLocalProperty("spark.job.description") == "outer"
    assert sc.getLocalProperty("spark.jobGroup.id") is None
