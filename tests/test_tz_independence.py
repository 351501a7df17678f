"""Timezone-independence gate.

The driver runs queries in ITS OWN SparkSession, which need not pin
``spark.sql.session.timeZone`` — so every timestamp-derived output must be
identical under any session timezone. Round 4 found (and fixed) two real
classes of violation:

- the catalog's TIMESTAMP_NTZ branch used ``cast("timestamp")``, which
  re-interprets the naive wall clock in the session zone (every absolute
  epoch output shifted by the zone offset);
- wall-clock field extraction (``hour(ts)``, ``cast(ts AS DATE)``) ran in
  the session zone instead of UTC.

This test replays the Spark-vs-DuckDB comparison for the timestamp-heavy
queries under America/New_York (whole-hour offset, catches instant shifts)
and Asia/Kathmandu (+05:45, catches sub-hour truncation/bucketing drift),
restoring UTC afterwards. The full-corpus sweep lives in the round logs;
this keeps the property pinned in the ordinary pytest run.
"""

from __future__ import annotations

import pytest

from airflow_postgres_csv_spark.queries import registry
from tools.verify_local import compare, duck_con

SF = "/root/testdata/sf0.001"

# every query here reads events.ts (the only TimestampType column)
SAMPLE = [
    "events_tumbling_window",  # F.window epoch bucketing
    "events_sessionization",  # session_window + epoch_us outputs
    "events_user_growth",  # utc_date day bucketing (was tz-dependent)
    "date_funcs2",  # utc_ntz field extraction (was tz-dependent)
    "rollup_ohlc_hourly",  # hourly buckets + epoch outputs
    "events_scd2_intervals",  # validity intervals in epoch micros
    "join_asof_nearest",  # gap arithmetic
    "events_windowed_funnel",  # chained deadline as-of joins
    "rollup_gapfill_locf",  # generated time spine vs event buckets
]


@pytest.mark.parametrize("tz", ["America/New_York", "Asia/Kathmandu"])
def test_timestamp_queries_are_tz_independent(spark, tz):
    reg = registry()
    con = duck_con(SF)
    prev = spark.conf.get("spark.sql.session.timeZone")
    failures = {}
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        for name in SAMPLE:
            rq = reg[name]
            spark_pdf = rq.fn(spark, SF).toPandas()
            duck_pdf = con.execute(rq.oracle).df()
            problems = compare(spark_pdf, duck_pdf)
            if problems:
                failures[name] = problems
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert failures == {}, failures
