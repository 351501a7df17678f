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


def test_png_bytes_is_spec_compliant():
    """The stdlib PNG writer must produce a structurally valid file:
    signature, IHDR fields, chunk CRCs, and an IDAT that zlib-decompresses
    to exactly height filter-0 RGB scanlines."""
    import struct
    import zlib

    raw = MM.png_bytes(5, 3, (10, 20, 30))
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    # walk chunks, checking every CRC
    i, chunks = 8, {}
    while i < len(raw):
        (ln,) = struct.unpack(">I", raw[i : i + 4])
        typ = raw[i + 4 : i + 8]
        data = raw[i + 8 : i + 8 + ln]
        (crc,) = struct.unpack(">I", raw[i + 8 + ln : i + 12 + ln])
        assert crc == zlib.crc32(typ + data) & 0xFFFFFFFF
        chunks[typ] = data
        i += 12 + ln
    w, h, depth, ctype = struct.unpack(">IIBB", chunks[b"IHDR"][:10])
    assert (w, h, depth, ctype) == (5, 3, 8, 2)
    pixels = zlib.decompress(chunks[b"IDAT"])
    assert pixels == (b"\x00" + bytes((10, 20, 30)) * 5) * 3


def test_parse_image_header_all_formats():
    """Real header decode for PNG (our own real encoder output) plus
    hand-assembled minimal JPEG/GIF/BMP headers per spec."""
    import struct

    assert MM.parse_image_header(MM.png_bytes(7, 4, (0, 0, 0))) == ("png", 7, 4)
    # JPEG: SOI + APP0 stub + SOF0 (precision 8, h=33, w=77, 3 comps)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 33, 77) + b"\x03"
    )
    assert MM.parse_image_header(jpeg) == ("jpeg", 77, 33)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 3
    assert MM.parse_image_header(gif) == ("gif", 320, 200)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 640, -480) + b"\x00" * 4
    assert MM.parse_image_header(bmp) == ("bmp", 640, 480)
    with pytest.raises(ValueError, match="unrecognized"):
        MM.parse_image_header(b"\x00\x01\x02\x03\x04\x05\x06\x07")


def test_real_png_encode_decode_round_trip(spark):
    """End-to-end on the cluster path: real PNGs encoded per document in
    mapInPandas, then decoded back — dims must match the deterministic
    doc_id functions the oracle predicts."""
    docs = load(spark, SF, "documents").limit(40)
    decoded = MM.decode_image_real(MM.attach_real_images(docs)).collect()
    assert len(decoded) == 40
    for r in decoded:
        assert r.format == "png"
        assert r.width == 1 + r.doc_id % 16
        assert r.height == 1 + r.doc_id % 9
        assert r.n_bytes > 44  # sig + IHDR + IEND overhead alone is 44


def test_wav_bytes_is_spec_compliant_and_parseable():
    """The stdlib WAV encoder must produce a container Python's own `wave`
    module (an independent RIFF implementation) agrees with, and
    parse_audio_header must report the same attributes."""
    import io
    import wave

    from airflow_postgres_csv_spark.operators.multimodal import (
        parse_audio_header,
        wav_bytes,
    )

    raw = wav_bytes(250, sample_rate=8000, freq_hz=440.0)
    with wave.open(io.BytesIO(raw)) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 8000
        assert w.getnframes() == 250
    fmt, rate, channels, bits, n_samples = parse_audio_header(raw)
    assert (fmt, rate, channels, bits, n_samples) == ("wav", 8000, 1, 16, 250)
    assert len(raw) == 44 + 2 * 250


def test_parse_audio_header_flac_streaminfo():
    """Hand-build a FLAC STREAMINFO block and check the bitfield walk."""
    from airflow_postgres_csv_spark.operators.multimodal import parse_audio_header

    rate, channels, bits, total = 44100, 2, 16, 123456
    word = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) | total
    body = bytes(10) + word.to_bytes(8, "big") + bytes(16)
    raw = b"fLaC" + b"\x80" + len(body).to_bytes(3, "big") + body
    assert parse_audio_header(raw) == ("flac", rate, channels, bits, total)


def test_parse_audio_header_rejects_unknown():
    import pytest

    from airflow_postgres_csv_spark.operators.multimodal import parse_audio_header

    with pytest.raises(ValueError, match="unrecognized"):
        parse_audio_header(b"OggS\x00\x00")
