"""Fixture-drift guard: events.ts must load identically from BOTH physical
encodings the driver has shipped — parquet TIMESTAMP(NANOS) (read as raw
int64 nanos under nanosAsLong) and parquet timestamp[us] (read as
TIMESTAMP_NTZ). The fixture schema changed once between rounds; this test
pins the dtype guard in catalog.load and streaming.windows.stream_events so
a future regeneration can't silently break ~30 queries again.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from airflow_postgres_csv_spark.catalog import load
from airflow_postgres_csv_spark.streaming.windows import stream_events

ROWS = {
    "event_id": [1, 2, 3],
    "user_id": [10, 10, 20],
    "event_type": ["click", "purchase", "click"],
    "value": [1.5, 2.0, 0.25],
    "props": ["{}", "{}", "{}"],
}
# micros since epoch; exercise sub-second precision
TS_US = [1_700_000_000_000_000, 1_700_000_000_500_000, 1_700_003_600_123_456]


def _write_events(path: str, kind: str) -> None:
    cols = {k: pa.array(v) for k, v in ROWS.items()}
    if kind == "nanos":
        cols["ts"] = pa.array([us * 1000 for us in TS_US], pa.int64()).cast(
            pa.timestamp("ns")
        )
    else:
        cols["ts"] = pa.array(TS_US, pa.int64()).cast(pa.timestamp("us"))
    table = pa.table(
        {
            "event_id": cols["event_id"],
            "ts": cols["ts"],
            "user_id": cols["user_id"],
            "event_type": cols["event_type"],
            "value": cols["value"],
            "props": cols["props"],
        }
    )
    pq.write_table(table, path)


@pytest.fixture(params=["nanos", "micros"])
def events_sf_dir(request, tmp_path):
    d = tmp_path / request.param
    d.mkdir()
    _write_events(str(d / "events.parquet"), request.param)
    return str(d)


def test_written_physical_types(tmp_path):
    # sanity: the two fixture generations really are physically different
    _write_events(str(tmp_path / "n.parquet"), "nanos")
    _write_events(str(tmp_path / "u.parquet"), "micros")
    assert pq.read_schema(str(tmp_path / "n.parquet")).field("ts").type == pa.timestamp("ns")
    assert pq.read_schema(str(tmp_path / "u.parquet")).field("ts").type == pa.timestamp("us")


def test_catalog_load_both_generations(spark, events_sf_dir):
    df = load(spark, events_sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = sorted(
        (r.event_id, r.us) for r in df.selectExpr("event_id", "unix_micros(ts) AS us").collect()
    )
    assert got == sorted(zip(ROWS["event_id"], TS_US))


def test_stream_events_both_generations(spark, events_sf_dir):
    sdf = stream_events(spark, events_sf_dir)
    assert isinstance(sdf.schema["ts"].dataType, T.TimestampType)
    q = (
        sdf.selectExpr("event_id", "unix_micros(ts) AS us")
        .writeStream.format("memory")
        .queryName("ts_guard_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted((r.event_id, r.us) for r in spark.table("ts_guard_sink").collect())
    assert got == sorted(zip(ROWS["event_id"], TS_US))
