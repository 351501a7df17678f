"""Multimodal-column queries, oracle-checked (SURVEY.md §2.3).

The FAKE1 container attributes are pure functions of ``doc_id`` and the
document text (operators/multimodal.py), so DuckDB replays each pipeline
*without* parsing bytes — i.e. the oracle independently validates the whole
encode → Arrow-batch decode round trip.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators import multimodal as MM
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import t

# DuckDB replay of _media_cols + body attributes (see attach_media docstring)
_SQL_MEDIA = """
  SELECT doc_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
         CAST(64 + (doc_id % 16) * 32 AS INT) AS width,
         CAST(64 + (doc_id % 9) * 32 AS INT) AS height,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 8 + doc_id % 24 END AS INT) AS n_frames,
         CAST(octet_length(encode(text)) AS BIGINT) AS body_len,
         md5(text) AS body_md5
  FROM documents
"""


# ---------------------------------------------------------------------------
# Full decode round trip: Spark builds binary payloads and parses them back
# in an Arrow-batched mapInPandas; DuckDB recomputes every field directly.
# ---------------------------------------------------------------------------

register(
    "multimodal_decode_meta",
    f"WITH m AS ({_SQL_MEDIA}) SELECT * FROM m ORDER BY doc_id",
)(
    # the fixture is ONE parquet file -> one scan partition; a real corpus
    # arrives as many files/row-groups. Repartition before the decode so
    # the Python stage uses every core, as it would on real input splits.
    lambda spark, sf_dir: (
        MM.decode_media(
            MM.attach_media(t(spark, sf_dir, "documents")).repartition(
                spark.sparkContext.defaultParallelism
            )
        ).orderBy("doc_id")
    )
)


# ---------------------------------------------------------------------------
# REAL codec round trip: Spark encodes actual spec-compliant PNG files
# (stdlib zlib IDAT, correct CRCs) per document, then parses the real byte
# layout back for format/dimensions. Dims are deterministic functions of
# doc_id, so the oracle predicts what the decoder must report without
# touching any bytes — independently certifying the codec.
# ---------------------------------------------------------------------------

register(
    "multimodal_decode_real_png",
    """
    SELECT doc_id,
           'png' AS format,
           CAST(1 + doc_id % 16 AS INT) AS width,
           CAST(1 + doc_id % 9 AS INT) AS height
    FROM documents ORDER BY doc_id
    """,
)(
    lambda spark, sf_dir: (
        MM.decode_image_real(
            MM.attach_real_images(t(spark, sf_dir, "documents")).repartition(
                spark.sparkContext.defaultParallelism
            )
        )
        .select("doc_id", "format", "width", "height")
        .orderBy("doc_id")
    )
)


# ---------------------------------------------------------------------------
# Metadata-only stats: runs entirely on the meta struct / payload length —
# the payload-pruning access pattern a 100 TB media table lives on.
# ---------------------------------------------------------------------------

register(
    "multimodal_payload_stats",
    f"""
    WITH m AS ({_SQL_MEDIA})
    SELECT media_type,
           COUNT(*) AS n,
           -- header is pure ASCII, so char length == byte length
           CAST(SUM(body_len + length(
             'FAKE1|' || media_type || '|' || CAST(width AS VARCHAR) || 'x' ||
             CAST(height AS VARCHAR) || '|' || CAST(n_frames AS VARCHAR) || '|'
           )) AS BIGINT) AS total_payload_bytes,
           MAX(width) AS max_width,
           MAX(n_frames) AS max_frames
    FROM m GROUP BY media_type ORDER BY media_type
    """,
)(
    lambda spark, sf_dir: (
        MM.attach_media(t(spark, sf_dir, "documents"))
        .groupBy(F.col("meta.media_type").alias("media_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("total_payload_bytes"),
            F.max("meta.width").alias("max_width"),
            F.max("meta.n_frames").alias("max_frames"),
        )
        .orderBy("media_type")
    )
)


# ---------------------------------------------------------------------------
# Video frame sampling: JVM-only sequence/explode/binary-substring; oracle
# replays the frame arithmetic with range() expansion.
# ---------------------------------------------------------------------------

register(
    "multimodal_frame_sample",
    f"""
    WITH m AS ({_SQL_MEDIA}),
    f AS (
      SELECT doc_id, body_len,
             unnest(range(0, CAST(ceil(body_len / 256.0) AS BIGINT), 4)) AS fi
      FROM m WHERE media_type = 'video' AND body_len > 0
    )
    SELECT doc_id,
           CAST(fi AS INT) AS frame_idx,
           CAST(LEAST(256, body_len - fi * 256) AS INT) AS frame_len
    FROM f ORDER BY doc_id, frame_idx
    """,
)(
    lambda spark, sf_dir: (
        MM.sample_frames(
            MM.attach_media(t(spark, sf_dir, "documents")).filter(
                F.col("meta.body_len") > 0
            ),
            frame_bytes=256,
            every=4,
        )
        .select("doc_id", "frame_idx", "frame_len")
        .orderBy("doc_id", "frame_idx")
    )
)


# ---------------------------------------------------------------------------
# REAL audio containers: spec-compliant PCM WAV encode (RIFF/fmt/data,
# stdlib-only) + header-walk decode (operators/multimodal.py wav_bytes /
# parse_audio_header). Duration is a deterministic function of doc_id, so
# the oracle predicts every decoded attribute — including the container
# byte size (44-byte canonical header + 2 bytes per 16-bit mono sample) —
# without parsing any bytes.
# ---------------------------------------------------------------------------

register(
    "multimodal_decode_real_wav",
    """
    SELECT doc_id,
           'wav' AS format,
           8000 AS sample_rate,
           1 AS n_channels,
           16 AS bits,
           CAST(100 + doc_id % 400 AS BIGINT) AS n_samples,
           CAST(44 + 2 * (100 + doc_id % 400) AS BIGINT) AS n_bytes
    FROM documents ORDER BY doc_id
    """,
)(
    lambda spark, sf_dir: (
        MM.decode_audio_real(
            MM.attach_real_audio(t(spark, sf_dir, "documents")).repartition(
                spark.sparkContext.defaultParallelism
            )
        ).orderBy("doc_id")
    )
)


# Audio FEATURE EXTRACTION over the real PCM tier: zero crossings, int64
# energy, peak — exact integer features from the decoded samples. The
# oracle recomputes the int16 sample stream from the synthesis formula
# (trunc(amp·sin), the same glibc sin both engines call on this host)
# and the identical integer features — certifying the decode+extract path
# end-to-end without any audio library.
register(
    "multimodal_audio_features",
    """
    WITH s AS (
      SELECT doc_id,
             list_transform(
               generate_series(0, CAST(100 + doc_id % 400 AS BIGINT) - 1),
               i -> CAST(trunc(16383 * sin(2 * pi() * (220 + (doc_id % 16) * 55)
                                           * i / 8000)) AS BIGINT)
             ) AS pcm
      FROM documents
    )
    SELECT doc_id,
           len(pcm) AS n_samples,
           CAST(len(list_filter(generate_series(1, len(pcm) - 1),
                 i -> (pcm[i] >= 0) <> (pcm[i + 1] >= 0))) AS BIGINT)
             AS zero_crossings,
           CAST(list_reduce(list_transform(pcm, v -> v * v), (a, b) -> a + b)
                AS BIGINT) AS energy,
           CAST(list_max(list_transform(pcm, v -> abs(v))) AS BIGINT) AS peak
    FROM s ORDER BY doc_id
    """,
)(
    lambda spark, sf_dir: (
        MM.audio_features_real(
            MM.attach_real_audio(t(spark, sf_dir, "documents")).repartition(
                spark.sparkContext.defaultParallelism
            )
        ).orderBy("doc_id")
    )
)


# Resize step on real codec bytes: PNG zlib pixel decode -> nearest-
# neighbor resample to 4x3 -> real PNG re-encode -> re-decode and report
# header dims + exact per-channel sums. Fixture images are solid colors,
# so the oracle predicts the sums as 12 x channel without a codec; the
# Spark side still runs the full decode/resample/encode plumbing.
register(
    "multimodal_image_resize",
    """
    SELECT doc_id,
           4 AS out_w, 3 AS out_h,
           CAST(12 * (doc_id % 256) AS BIGINT) AS sum_r,
           CAST(12 * ((doc_id * 7) % 256) AS BIGINT) AS sum_g,
           CAST(12 * ((doc_id * 13) % 256) AS BIGINT) AS sum_b
    FROM documents ORDER BY doc_id
    """,
)(
    lambda spark, sf_dir: (
        MM.image_resize_real(
            MM.attach_real_images(t(spark, sf_dir, "documents")).repartition(
                spark.sparkContext.defaultParallelism
            )
        ).orderBy("doc_id")
    )
)
