"""Multimodal column plumbing: binary payload round trip, frame slicing,
payload-free column pruning, and the real-codec stub gate."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.catalog import load
from airflow_postgres_csv_spark.operators import multimodal as MM

SF = "/root/testdata/sf0.001"


def test_decode_round_trips_payload(spark):
    docs = load(spark, SF, "documents").limit(20)
    decoded = {r.doc_id: r for r in MM.decode_media(MM.attach_media(docs)).collect()}
    for r in docs.collect():
        d = decoded[r.doc_id]
        assert d.media_type == ("image", "audio", "video")[r.doc_id % 3]
        assert d.width == 64 + (r.doc_id % 16) * 32
        assert d.body_len == len(r.text.encode())
        assert d.body_md5 == hashlib.md5(r.text.encode()).hexdigest()


def test_frames_reassemble_to_body(spark):
    """With every=1 the sampled frames concatenate back to the exact body."""
    docs = load(spark, SF, "documents").filter(F.col("doc_id") % 3 == 2).limit(5)
    media = MM.attach_media(docs)
    frames = MM.sample_frames(media, frame_bytes=256, every=1).collect()
    bodies = {r.doc_id: r.text.encode() for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for f in frames:
        by_doc.setdefault(f.doc_id, []).append(f)
    for doc_id, fs in by_doc.items():
        joined = b"".join(bytes(f.frame) for f in sorted(fs, key=lambda f: f.frame_idx))
        assert joined == bodies[doc_id]
        assert all(f.frame_len == len(bytes(f.frame)) for f in fs)


def test_metadata_scan_prunes_payload(spark, tmp_path):
    """Selecting only metadata from a persisted media table must not read
    the payload column (ReadSchema pruning) — the access pattern that makes
    a 100 TB media table queryable."""
    out = str(tmp_path / "media")
    MM.attach_media(load(spark, SF, "documents")).write.parquet(out)
    df = spark.read.parquet(out).select("doc_id", "meta.media_type")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
    assert df.count() > 0


def test_real_codec_path_is_gated(spark):
    media = MM.attach_media(load(spark, SF, "documents").limit(1))
    with pytest.raises(NotImplementedError, match="Pillow"):
        MM.decode_image_real(media)
