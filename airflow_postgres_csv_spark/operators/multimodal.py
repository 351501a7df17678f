"""Multimodal (image/audio/video) column support (SURVEY.md §2.3).

Media payloads are opaque ``binary`` columns travelling next to a typed
metadata struct; all relational logic (filtering, routing, stats) runs on
the metadata so Parquet column pruning never drags payload bytes through a
stage that doesn't decode them. Decode / frame-sample are Arrow-batched
``mapInPandas`` operators — embarrassingly parallel, no shuffle.

Two codec tiers:

- ``FAKE1`` container (:func:`attach_media` / :func:`decode_media`): an
  ASCII header + the raw document text as body — a deterministic stand-in
  whose attributes an independent SQL oracle can recompute, used for the
  full round-trip differential tests.
- REAL image containers (:func:`png_bytes` / :func:`attach_real_images` /
  :func:`decode_image_real` / :func:`parse_image_header`): actual
  spec-compliant PNG encoding (stdlib zlib, correct CRCs) and actual
  PNG/JPEG/GIF/BMP header decoding — no imaging library required; PIL is
  used automatically when importable. Pixel-level transforms (resize,
  frame extraction from video codecs) would still need PIL/ffmpeg and
  drop into the same ``mapInPandas`` batch functions.

100 TB design notes:
- payload-free pruning: ``df.select("doc_id", "meta.*")`` reads only the
  metadata columns from parquet (ReadSchema excludes ``payload``).
- decode is ``mapInPandas`` over whatever partitioning the scan produced:
  zero shuffle, scales linearly with executors; Arrow moves the binary
  batches without pickling.
- frame sampling is pure JVM (``sequence`` + ``explode`` + binary
  ``substring``) — no Python in that hot path at all.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "attach_media",
    "decode_media",
    "sample_frames",
    "png_bytes",
    "parse_image_header",
    "attach_real_images",
    "decode_image_real",
    "wav_bytes",
    "parse_audio_header",
    "attach_real_audio",
    "decode_audio_real",
    "MEDIA_TYPES",
    "DECODED_SCHEMA",
    "REAL_IMAGE_SCHEMA",
    "REAL_AUDIO_SCHEMA",
]

MEDIA_TYPES = ("image", "audio", "video")


def _media_cols():
    """Deterministic fake-media attributes derived from doc_id (so the
    DuckDB oracle can recompute them without parsing any bytes)."""
    doc_id = F.col("doc_id")
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]), (doc_id % 3 + 1).cast("int")
    )
    width = (F.lit(64) + (doc_id % 16) * 32).cast("int")
    height = (F.lit(64) + (doc_id % 9) * 32).cast("int")
    n_frames = F.when(doc_id % 3 == 0, F.lit(1)).otherwise(
        (F.lit(8) + doc_id % 24).cast("int")
    )
    return mt, width, height, n_frames


def attach_media(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct).

    Payload is the ``FAKE1`` container: ASCII header
    ``FAKE1|{type}|{w}x{h}|{n_frames}|`` followed by the UTF-8 body (the
    document text standing in for pixel/sample data). The metadata struct
    carries everything a non-decoding stage needs.
    """
    mt, width, height, n_frames = _media_cols()
    header = F.concat(
        F.lit("FAKE1|"),
        mt,
        F.lit("|"),
        width.cast("string"),
        F.lit("x"),
        height.cast("string"),
        F.lit("|"),
        n_frames.cast("string"),
        F.lit("|"),
    )
    body_len = F.length(F.to_binary(F.col("text"), F.lit("utf-8")))
    payload = F.to_binary(F.concat(header, F.col("text")), F.lit("utf-8"))
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            mt.alias("media_type"),
            width.alias("width"),
            height.alias("height"),
            n_frames.alias("n_frames"),
            body_len.alias("body_len"),
        ).alias("meta"),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("body_len", T.LongType()),
        T.StructField("body_md5", T.StringType()),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Parse the payload container; emit typed metadata + a body digest.

    The Arrow-batched ``mapInPandas`` shape is the real thing a production
    decoder uses — only ``_parse`` (pure bytes→fields) would change when a
    real codec (PIL / soundfile / pyav) replaces the fake container.
    """

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in DECODED_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                magic, mt, dims, nf, body = raw.split(b"|", 4)
                if magic != b"FAKE1":
                    raise ValueError(f"bad container magic {magic!r}")
                w, h = dims.split(b"x")
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt.decode())
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["n_frames"].append(int(nf))
                out["body_len"].append(len(body))
                out["body_md5"].append(hashlib.md5(body).hexdigest())
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(_parse, DECODED_SCHEMA)


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, every: int = 4
) -> DataFrame:
    """Sample every ``every``-th fixed-size frame from video payloads.

    Pure JVM path: the body is divided into ``ceil(body_len/frame_bytes)``
    physical frames; sampled frame bytes come out of a binary
    ``substring`` — no Python, no shuffle, and on parquet the video-only
    filter prunes at the metadata level before payload bytes are read.
    """
    vids = media.filter(F.col("meta.media_type") == "video")
    hdr_len = F.length("payload") - F.col("meta.body_len")
    n_phys = F.ceil(F.col("meta.body_len") / F.lit(frame_bytes)).cast("int")
    return (
        vids.select(
            "doc_id",
            "payload",
            hdr_len.alias("_hdr"),
            F.col("meta.body_len").alias("_blen"),
            F.explode(
                F.sequence(F.lit(0), n_phys - 1, F.lit(every))
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.expr(
                f"substring(payload, _hdr + frame_idx * {frame_bytes} + 1, {frame_bytes})"
            ).alias("frame"),
        )
        .withColumn("frame_len", F.length("frame").cast("int"))
    )


def png_bytes(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Encode a REAL solid-color 8-bit RGB PNG — pure stdlib (zlib+struct).

    Spec-complete for this shape: signature, IHDR, one zlib IDAT of
    filter-0 scanlines, IEND, with correct CRCs. Any standards-compliant
    viewer/decoder opens the output; no imaging library involved.
    """
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    scanline = b"\x00" + bytes(rgb) * width  # filter type 0 + RGB pixels
    idat = zlib.compress(scanline * height, 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def parse_image_header(raw: bytes) -> tuple[str, int, int]:
    """Real image metadata decode: (format, width, height) from the actual
    byte layout of PNG / JPEG / GIF / BMP — the four container headers a
    100 TB web-scraped image column overwhelmingly consists of.

    Pure Python over a handful of header bytes per file, so the cost per
    image is nanoseconds regardless of payload size — the right shape for
    a metadata-extraction pass that must not decompress pixel data.
    """
    import struct

    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", raw[16:24])
        return "png", w, h
    if raw[:2] == b"\xff\xd8":  # JPEG SOI; walk markers to SOFn
        i = 2
        while i + 9 < len(raw):
            if raw[i] != 0xFF:
                i += 1
                continue
            marker = raw[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", raw[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", raw[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seg_len
        raise ValueError("JPEG without SOF frame header")
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", raw[6:10])
        return "gif", w, h
    if raw[:2] == b"BM":
        w, h = struct.unpack("<ii", raw[18:26])
        return "bmp", w, abs(h)  # negative height = top-down DIB
    raise ValueError(f"unrecognized image container: {raw[:8]!r}")


REAL_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_real_images(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary) where payload is a REAL PNG.

    Dimensions/color are deterministic functions of doc_id (width
    ``1 + doc_id % 16``, height ``1 + doc_id % 9``) so a non-decoding
    oracle can predict what the decoder must report. Encoding runs in an
    Arrow-batched ``mapInPandas`` — the exact plumbing a real
    resize/transcode stage uses, with real codec output.
    """

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = [
                png_bytes(
                    1 + int(i) % 16,
                    1 + int(i) % 9,
                    (int(i) % 256, (int(i) * 7) % 256, (int(i) * 13) % 256),
                )
                for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return docs.select("doc_id").mapInPandas(_encode, schema)


def decode_image_real(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode: parse actual PNG/JPEG/GIF/BMP bytes for format +
    dimensions (:func:`parse_image_header`). If Pillow is importable the
    parse is delegated to ``PIL.Image.open`` (identify-only — lazy, no
    pixel decode); otherwise the stdlib header parser handles the same
    formats. Either way this operates on real image containers, not the
    FAKE1 stand-in.
    """
    try:
        from PIL import Image as _PIL  # noqa: N814
        import io as _io

        def _dims(raw: bytes) -> tuple[str, int, int]:
            with _PIL.open(_io.BytesIO(raw)) as im:
                return (im.format or "?").lower(), im.width, im.height

    except ImportError:
        _dims = parse_image_header

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in REAL_IMAGE_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(payload)
                fmt, w, h = _dims(raw)
                out["doc_id"].append(int(doc_id))
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(raw))
            yield pd.DataFrame(out)

    return media.select("doc_id", payload_col).mapInPandas(
        _parse, REAL_IMAGE_SCHEMA
    )


def wav_bytes(
    n_samples: int,
    sample_rate: int = 8000,
    freq_hz: float = 440.0,
    amplitude: float = 0.5,
) -> bytes:
    """Encode a REAL PCM WAV (RIFF/WAVE, 16-bit mono sine) — pure stdlib.

    Spec-complete: RIFF header, ``fmt `` chunk (PCM, mono, 16-bit), one
    ``data`` chunk of little-endian samples. Any audio tool opens the
    output; no audio library involved — the audio sibling of
    :func:`png_bytes`.
    """
    import math
    import struct

    amp = int(max(0.0, min(1.0, amplitude)) * 32767)
    data = b"".join(
        struct.pack(
            "<h", int(amp * math.sin(2.0 * math.pi * freq_hz * i / sample_rate))
        )
        for i in range(n_samples)
    )
    byte_rate = sample_rate * 2  # mono 16-bit
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def parse_audio_header(raw: bytes) -> tuple[str, int, int, int, int]:
    """Real audio metadata decode: (format, sample_rate, n_channels,
    bits_per_sample, n_samples) from actual WAV (RIFF chunk walk) or FLAC
    (STREAMINFO bitfields) byte layouts.

    Header-only — like :func:`parse_image_header` it never touches the
    sample payload, so cost per file is independent of duration.
    """
    import struct

    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        i = 12
        rate = channels = bits = n_samples = None
        while i + 8 <= len(raw):
            cid = raw[i : i + 4]
            clen = struct.unpack("<I", raw[i + 4 : i + 8])[0]
            if cid == b"fmt ":
                _, channels, rate, _, _, bits = struct.unpack(
                    "<HHIIHH", raw[i + 8 : i + 24]
                )
            elif cid == b"data" and channels:
                n_samples = clen // (channels * bits // 8)
            i += 8 + clen + (clen & 1)  # chunks are word-aligned
        if rate is None or n_samples is None:
            raise ValueError("WAV without fmt/data chunks")
        return "wav", rate, channels, bits, n_samples
    if raw[:4] == b"fLaC":
        # METADATA_BLOCK_HEADER (4 bytes) then STREAMINFO: sample rate is
        # 20 bits at byte offset 10 of the block body, channels-1 next 3
        # bits, bits-1 next 5, total samples the following 36.
        body = raw[8:]
        word = int.from_bytes(body[10:18], "big")
        rate = word >> 44
        channels = ((word >> 41) & 0x7) + 1
        bits = ((word >> 36) & 0x1F) + 1
        n_samples = word & ((1 << 36) - 1)
        return "flac", rate, channels, bits, n_samples
    raise ValueError(f"unrecognized audio container: {raw[:4]!r}")


REAL_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_real_audio(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary) where payload is a REAL WAV.

    Duration is a deterministic function of doc_id (``100 + doc_id % 400``
    samples at 8 kHz) so a non-decoding oracle can predict every attribute
    the decoder must report, including the container byte size
    (44-byte canonical header + 2 bytes/sample)."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = [
                wav_bytes(100 + int(i) % 400, 8000, 220.0 + (int(i) % 16) * 55.0)
                for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return docs.select("doc_id").mapInPandas(_encode, schema)


def decode_audio_real(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real audio decode: parse actual WAV/FLAC container bytes for rate /
    channels / bit depth / sample count (:func:`parse_audio_header`) —
    same Arrow-batched, shuffle-free shape as :func:`decode_image_real`."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in REAL_AUDIO_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(payload)
                fmt, rate, channels, bits, n_samples = parse_audio_header(raw)
                out["doc_id"].append(int(doc_id))
                out["format"].append(fmt)
                out["sample_rate"].append(rate)
                out["n_channels"].append(channels)
                out["bits"].append(bits)
                out["n_samples"].append(n_samples)
                out["n_bytes"].append(len(raw))
            yield pd.DataFrame(out)

    return media.select("doc_id", payload_col).mapInPandas(
        _parse, REAL_AUDIO_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


def audio_features_real(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Feature extraction over REAL PCM payloads — the "feature-extract"
    step of the multimodal pipeline, past header decode: parse the WAV
    data chunk into int16 samples (numpy ``frombuffer``, zero-copy per
    Arrow batch) and emit exact integer signal features:

    - ``zero_crossings`` — sign flips between consecutive samples (the
      classic cheap pitch/voicedness proxy),
    - ``energy`` — Σ s² in int64 (loudness),
    - ``peak`` — max |s| (clipping detector).

    All-integer outputs, so the oracle replays them bit-exactly from the
    same synthesis formula without any audio decoding. Same Arrow-batched
    map-only shape as the decoders: no shuffle, scales with executors.
    """
    import numpy as np

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FEATURES_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(payload)
                s = np.frombuffer(raw, dtype="<i2", offset=44).astype("int64")
                pos = s >= 0
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(len(s))
                out["zero_crossings"].append(
                    int(np.count_nonzero(pos[:-1] != pos[1:]))
                )
                out["energy"].append(int((s * s).sum()))
                out["peak"].append(int(np.abs(s).max()) if len(s) else 0)
            yield pd.DataFrame(out)

    return media.select("doc_id", payload_col).mapInPandas(
        _feats, AUDIO_FEATURES_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def decode_png_pixels(raw: bytes):
    """Decode a filter-0 8-bit RGB PNG (the shape :func:`png_bytes` emits)
    to an (h, w, 3) numpy array — stdlib zlib + struct, no imaging lib."""
    import struct
    import zlib

    import numpy as np

    if raw[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", raw[16:24])
    idat = b""
    i = 8
    while i + 8 <= len(raw):
        (clen,) = struct.unpack(">I", raw[i : i + 4])
        ctype = raw[i + 4 : i + 8]
        if ctype == b"IDAT":
            idat += raw[i + 8 : i + 8 + clen]
        i += 12 + clen
    rows = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(
        h, 1 + 3 * w
    )
    if rows[:, 0].any():
        raise ValueError("unsupported PNG filter type (only 0 handled)")
    return rows[:, 1:].reshape(h, w, 3)


def image_resize_real(
    media: DataFrame, out_w: int = 4, out_h: int = 3, payload_col: str = "payload"
) -> DataFrame:
    """The resize step of the multimodal pipeline, on REAL codec bytes:
    zlib-decode PNG pixels, nearest-neighbor resample to (out_w, out_h)
    with the floor index map ``src = (dst * src_dim) // dst_dim``,
    RE-ENCODE the result as a real PNG, then report the re-encoded
    image's header dims and exact per-channel pixel sums.

    All outputs are integers, deterministic from the payload alone —
    the oracle predicts them from the synthesis formula without touching
    a codec. Arrow-batched map-only; no shuffle.
    """
    import numpy as np

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in RESIZE_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                px = decode_png_pixels(bytes(payload))
                h, w = px.shape[:2]
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                res = px[np.ix_(ys, xs)]
                # real re-encode (generic filter-0 scanlines), then trust
                # only the re-decoded bytes for every reported number
                import struct
                import zlib

                def chunk(typ: bytes, data: bytes) -> bytes:
                    return (
                        struct.pack(">I", len(data))
                        + typ
                        + data
                        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
                    )

                ihdr = struct.pack(">IIBBBBB", out_w, out_h, 8, 2, 0, 0, 0)
                sl = b"".join(
                    b"\x00" + res[y].tobytes() for y in range(out_h)
                )
                enc = (
                    b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(sl, 6))
                    + chunk(b"IEND", b"")
                )
                fmt, rw, rh = parse_image_header(enc)
                assert fmt == "png"
                back = decode_png_pixels(enc).astype("int64")
                out["doc_id"].append(int(doc_id))
                out["out_w"].append(rw)
                out["out_h"].append(rh)
                out["sum_r"].append(int(back[:, :, 0].sum()))
                out["sum_g"].append(int(back[:, :, 1].sum()))
                out["sum_b"].append(int(back[:, :, 2].sum()))
            yield pd.DataFrame(out)

    return media.select("doc_id", payload_col).mapInPandas(_resize, RESIZE_SCHEMA)
