"""Multimodal (image/audio/video) column support (SURVEY.md §2.3).

Media payloads are opaque ``binary`` columns travelling next to a typed
metadata struct; all relational logic (filtering, routing, stats) runs on
the metadata so Parquet column pruning never drags payload bytes through a
stage that doesn't decode them. Decode / frame-sample are Arrow-batched
``mapInPandas`` operators — embarrassingly parallel, no shuffle.

The container image/audio libs aren't in this environment, so the *codec*
step is a deterministic fake: payloads use the ``FAKE1`` container built by
:func:`attach_media` (an ASCII header + the raw document text as body), and
:func:`decode_media` parses it. Everything Spark-side — binary schema,
Arrow batch shape, UDF signatures, partition behavior — is real and
tested; swapping the fake parser for PIL/ffmpeg changes only the inner
per-batch function (see :func:`decode_image_real`).

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
    "decode_image_real",
    "MEDIA_TYPES",
    "DECODED_SCHEMA",
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


def decode_image_real(media: DataFrame) -> DataFrame:
    """Real image decode (PIL) — STUB: the imaging stack is not installed
    in this environment. The call shape and output schema mirror
    :func:`decode_media`; only the per-batch body differs.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - always taken here
        raise NotImplementedError(
            "real image decode requires Pillow, which is not available in "
            "this environment; use decode_media (FAKE1 container) instead"
        ) from exc
    raise NotImplementedError("real codec path not wired")  # pragma: no cover
