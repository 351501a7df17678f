"""Fixture-drift guards for the other driver-regenerable text columns
(VERDICT r3 'Next round' #8): ``events.props`` and ``documents.text`` must
load identically from every plausible physical encoding a fixture
regeneration could ship — plain ``string``, ``large_string`` (pandas/arrow
flips to it for big corpora), and dictionary-encoded string (arrow's
categorical path). Same contract style as tests/test_catalog_ts_guard.py:
write each encoding, assert the loader yields StringType with identical
values, so the next regeneration is a no-op instead of a red round.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_postgres_csv_spark.catalog import load
from airflow_postgres_csv_spark.streaming.windows import stream_events

ENCODINGS = ("string", "large_string", "dict_string")

PROPS = ['{"k": 1}', "{}", '{"deep": {"x": [1, 2]}}']
TEXTS = ["alpha beta gamma", "", "unicode é中文 text"]


def _str_array(values: list[str], kind: str) -> pa.Array:
    if kind == "string":
        return pa.array(values, pa.string())
    if kind == "large_string":
        return pa.array(values, pa.large_string())
    return pa.array(values, pa.string()).dictionary_encode()


def _write_events(path: str, kind: str) -> None:
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(
                    [1_700_000_000_000_000 + i for i in range(3)], pa.int64()
                ).cast(pa.timestamp("us")),
                "user_id": pa.array([10, 10, 20], pa.int64()),
                "event_type": _str_array(["click", "purchase", "click"], kind),
                "value": pa.array([1.5, 2.0, 0.25], pa.float64()),
                "props": _str_array(PROPS, kind),
            }
        ),
        path,
    )


def _write_documents(path: str, kind: str) -> None:
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": _str_array(TEXTS, kind),
                "lang": _str_array(["en", "en", "zz"], kind),
                "source": _str_array(["web", "web", "book"], kind),
                "n_chars": pa.array([len(t) for t in TEXTS], pa.int64()),
            }
        ),
        path,
    )


@pytest.fixture(params=ENCODINGS)
def drift_sf_dir(request, tmp_path):
    d = tmp_path / request.param
    # stream_events takes an events-only directory (production stages one);
    # the batch loader takes the sf dir with every table.
    (d / "events_stream").mkdir(parents=True)
    _write_events(str(d / "events.parquet"), request.param)
    _write_events(str(d / "events_stream" / "events.parquet"), request.param)
    _write_documents(str(d / "documents.parquet"), request.param)
    return str(d)


def test_written_physical_types(tmp_path):
    # sanity: the encodings really are different arrow types on disk
    for kind, want in (
        ("string", pa.string()),
        ("large_string", pa.large_string()),
        ("dict_string", pa.dictionary(pa.int32(), pa.string())),
    ):
        p = str(tmp_path / f"{kind}.parquet")
        _write_documents(p, kind)
        assert pq.read_schema(p).field("text").type == want


def test_documents_text_loads_all_encodings(spark, drift_sf_dir):
    df = load(spark, drift_sf_dir, "documents")
    for col in ("text", "lang", "source"):
        assert isinstance(df.schema[col].dataType, T.StringType)
    got = sorted((r.doc_id, r.text) for r in df.select("doc_id", "text").collect())
    assert got == sorted(enumerate(TEXTS, start=1))


def test_events_props_loads_all_encodings(spark, drift_sf_dir):
    df = load(spark, drift_sf_dir, "events")
    assert isinstance(df.schema["props"].dataType, T.StringType)
    got = sorted((r.event_id, r.props) for r in df.select("event_id", "props").collect())
    assert got == sorted(enumerate(PROPS, start=1))
    # and the column stays json-parsable, the way ~10 queries consume it
    parsed = df.select(
        F.get_json_object("props", "$.k").alias("k")
    ).where(F.col("k").isNotNull())
    assert parsed.count() == 1


def test_stream_events_props_all_encodings(spark, drift_sf_dir):
    sdf = stream_events(spark, f"{drift_sf_dir}/events_stream")
    assert isinstance(sdf.schema["props"].dataType, T.StringType)
    q = (
        sdf.select("event_id", "props")
        .writeStream.format("memory")
        .queryName("props_guard_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.event_id, r.props) for r in spark.table("props_guard_sink").collect()
    )
    assert got == sorted(enumerate(PROPS, start=1))
