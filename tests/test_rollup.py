"""Unit tests for operators/rollup.py on a hand-computable series."""

from datetime import datetime, timezone

import pyspark.sql.functions as F
import pytest

from airflow_postgres_csv_spark.operators.rollup import (
    gapfill,
    rollup_timeseries,
    time_bucket,
)


def _ts(h):
    return datetime(2024, 1, 1, h, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def rolled(spark):
    # key "a": observations at hours 0, 3 (gap at 1, 2); key "b": hour 1 only.
    df = spark.createDataFrame(
        [
            ("a", _ts(0), 10.0),
            ("a", _ts(0), 30.0),  # same bucket: aggregates to avg 20
            ("a", _ts(3), 50.0),
            ("b", _ts(1), 7.0),
        ],
        "k string, ts timestamp, v double",
    )
    return rollup_timeseries(
        df,
        ts_col="ts",
        width_seconds=3600,
        keys=["k"],
        aggs=[F.avg("v").alias("v"), F.count(F.lit(1)).alias("n")],
    )


def test_time_bucket_floors_to_width(spark):
    df = spark.createDataFrame([(_ts(1),)], "ts timestamp").select(
        F.unix_timestamp(time_bucket("ts", 7200)).alias("b")
    )
    assert df.first().b == int(_ts(0).timestamp())


def test_rollup_aggregates_within_bucket(rolled):
    rows = {(r.k, r.bucket.hour): (r.v, r.n) for r in rolled.collect()}
    assert rows[("a", 0)] == (20.0, 2)
    assert rows[("a", 3)] == (50.0, 1)
    assert rows[("b", 1)] == (7.0, 1)


def test_gapfill_spine_is_per_key(rolled):
    dense = gapfill(rolled, "bucket", 3600, ["k"], fill={"v": "null", "n": "null"})
    per_key = {
        r.k: r.cnt for r in dense.groupBy("k").agg(F.count("*").alias("cnt")).collect()
    }
    # a spans hours 0..3 (4 buckets); b has a single observed bucket.
    assert per_key == {"a": 4, "b": 1}


def test_gapfill_const_and_locf(rolled):
    dense = gapfill(
        rolled, "bucket", 3600, ["k"], fill={"n": ("const", 0), "v": "locf"}
    ).filter(F.col("k") == "a")
    got = {r.bucket.hour: (r.v, r.n) for r in dense.collect()}
    assert got == {0: (20.0, 2), 1: (20.0, 0), 2: (20.0, 0), 3: (50.0, 1)}


def test_gapfill_linear_interpolates_and_handles_edges(spark, rolled):
    dense = gapfill(rolled, "bucket", 3600, ["k"], fill={"v": "linear", "n": "null"})
    a = {r.bucket.hour: r.v for r in dense.filter(F.col("k") == "a").collect()}
    # 20 -> 50 over 3 hours: 30 at h1, 40 at h2.
    assert a == {0: 20.0, 1: 30.0, 2: 40.0, 3: 50.0}
    # single-observation key: no bracketing pair, value passes through.
    b = {r.bucket.hour: r.v for r in dense.filter(F.col("k") == "b").collect()}
    assert b == {1: 7.0}


def test_gapfill_unknown_strategy_raises(rolled):
    with pytest.raises(ValueError, match="unknown fill strategy"):
        gapfill(rolled, "bucket", 3600, ["k"], fill={"v": "bogus"})
