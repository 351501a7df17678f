"""Deduplication query corpus (SURVEY.md §2.3) over documents/embeddings.

Exact dedup, n-gram Jaccard, and the *entire* MinHash+LSH pipeline are
oracle-checked: MD5-based signatures are bit-identical across engines, so
the DuckDB oracle replays signature → banding → candidates → verification
in SQL. SimHash uses xxhash64 (no DuckDB equivalent) → rows-only with a
pytest invariant instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.functions import texts as X
from airflow_postgres_csv_spark.operators import dedup as D
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import t

SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
SQL_TOKENS = f"string_split({SQL_NORM}, ' ')"

# Shared oracle CTEs: distinct 3-gram shingles per doc + exact jaccard pairs.
_SQL_SHINGLES = f"""
toks AS (
  SELECT doc_id, {SQL_TOKENS} AS tk FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
  FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
jacc AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(COUNT(*) AS DOUBLE) / (sa.n + sb.n - COUNT(*)) AS jaccard
  FROM shingles a
  JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN sizes sa ON sa.doc_id = a.doc_id
  JOIN sizes sb ON sb.doc_id = b.doc_id
  GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
)
"""

register(
    "dedup_exact_documents",
    f"""
    SELECT md5({SQL_NORM}) AS fp, MIN(doc_id) AS survivor_id, COUNT(*) AS n_dups
    FROM documents GROUP BY fp ORDER BY survivor_id
    """,
)(
    lambda spark, sf_dir: (
        D.dedup_exact(
            t(spark, sf_dir, "documents"), X.fingerprint_md5("text").alias("fp")
        )
        .withColumnRenamed("dedup_key", "fp")
        .orderBy("survivor_id")
    )
)


register(
    "dedup_exact_composite",
    """
    SELECT lang, n_chars, MIN(doc_id) AS survivor_id, COUNT(*) AS n_dups
    FROM documents GROUP BY lang, n_chars
    ORDER BY lang, n_chars
    """,
)(
    lambda spark, sf_dir: (
        D.dedup_exact(t(spark, sf_dir, "documents"), ["lang", "n_chars"])
        .orderBy("lang", "n_chars")
    )
)


register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SQL_SHINGLES}
    SELECT id_a, id_b, jaccard FROM jacc
    WHERE jaccard >= 0.5
    ORDER BY id_a, id_b
    """,
)(
    lambda spark, sf_dir: (
        D.ngram_jaccard_pairs(
            t(spark, sf_dir, "documents"), threshold=0.5
        ).orderBy("id_a", "id_b")
    )
)


# MinHash + LSH, fully replayed in SQL: 8 hashes, 4 bands of 2.
_SIG_COLS = ",\n".join(
    f"    MIN(md5(shingle || '#{i}')) AS sig_{i}" for i in range(8)
)
_BAND_ROWS = ",\n".join(
    f"    ({bi}, md5(sig_{2 * bi} || '|' || sig_{2 * bi + 1}))" for bi in range(4)
)

register(
    "dedup_minhash_lsh",
    f"""
    WITH {_SQL_SHINGLES},
    sig AS (
      SELECT doc_id,
{_SIG_COLS}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, b.band_idx, b.band_key
      FROM sig, LATERAL (VALUES
{_BAND_ROWS}
      ) b(band_idx, band_key)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                   AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b, j.jaccard
    FROM cand c JOIN jacc j ON j.id_a = c.id_a AND j.id_b = c.id_b
    WHERE j.jaccard >= 0.5
    ORDER BY c.id_a, c.id_b
    """,
)(
    lambda spark, sf_dir: (
        D.minhash_near_dup_pairs(
            t(spark, sf_dir, "documents"), num_hashes=8, bands=4, threshold=0.5
        ).orderBy("id_a", "id_b")
    )
)


# SimHash: xxhash64-based → no cross-engine oracle; rows-only check here,
# invariants (symmetry with exact jaccard pairs) in tests/test_dedup.py.
register("dedup_simhash", None)(
    lambda spark, sf_dir: (
        D.simhash_near_dup_pairs(
            t(spark, sf_dir, "documents"), max_hamming=3
        ).orderBy("id_a", "id_b")
    )
)


register(
    "dedup_embedding_cosine",
    """
    WITH e AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(
             list_reduce(list_transform(list_zip(a.v, b.v), s -> s[1] * s[2]), (x,y) -> x + y)
             / SQRT(list_reduce(list_transform(list_zip(a.v, a.v), s -> s[1] * s[2]), (x,y) -> x + y)
                  * list_reduce(list_transform(list_zip(b.v, b.v), s -> s[1] * s[2]), (x,y) -> x + y)),
             9) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_reduce(list_transform(list_zip(a.v, b.v), s -> s[1] * s[2]), (x,y) -> x + y)
          / SQRT(list_reduce(list_transform(list_zip(a.v, a.v), s -> s[1] * s[2]), (x,y) -> x + y)
               * list_reduce(list_transform(list_zip(b.v, b.v), s -> s[1] * s[2]), (x,y) -> x + y)) >= 0.4
    ORDER BY id_a, id_b
    """,
)(
    lambda spark, sf_dir: (
        D.embedding_near_dup_pairs(
            t(spark, sf_dir, "embeddings"), threshold=0.4, block_col="label"
        )
        .withColumn("cosine", F.round("cosine", 9))
        .orderBy("id_a", "id_b")
    )
)
