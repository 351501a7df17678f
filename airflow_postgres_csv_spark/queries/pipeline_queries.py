"""End-to-end LLM-data-pipeline queries: embedding generation and the
composed corpus-curation pass (language filter → quality gate → exact
dedup → token-length band). Each stage is an operator proven elsewhere;
these queries prove the composition — the actual shape of a training-data
build job — stays oracle-exact."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.functions import texts as X
from airflow_postgres_csv_spark.operators.embedding import embed_texts
from airflow_postgres_csv_spark.operators.grouped import rank_normalize
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import t
from airflow_postgres_csv_spark.queries.text_queries import SQL_NORM, SQL_TOKENS

# ---------------------------------------------------------------------------
# Embedding generation via the Arrow-batched pandas UDF, replayed in SQL
# (md5-nibble fake features are engine-portable by construction), output
# unnested to scalars so value hashing is exact.
# ---------------------------------------------------------------------------

register(
    "pipeline_embed_texts",
    """
    SELECT d.doc_id,
           CAST(g.j AS INT) AS j,
           (strpos('0123456789abcdef', substr(md5(d.text), CAST(g.j AS INT) + 1, 1)) - 1) / 15.0 AS val
    FROM documents d, generate_series(0, 7) g(j)
    ORDER BY d.doc_id, j
    """,
)(
    lambda spark, sf_dir: (
        embed_texts(t(spark, sf_dir, "documents"), dim=8)
        .select("doc_id", F.posexplode("embedding").alias("j", "val"))
        .orderBy("doc_id", "j")
    )
)


# ---------------------------------------------------------------------------
# Corpus curation: labeled-en → quality >= 70 → exact-dedup on normalized
# text (keep lowest doc_id) → 10..2000-token band. At 100 TB: the filters
# are scan-level predicates, the dedup is one hash shuffle on the
# normalized-text key — nothing here is quadratic or driver-bound.
# ---------------------------------------------------------------------------

register(
    "pipeline_corpus_curation",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len({SQL_TOKENS}) AS n_tokens,
             (CASE WHEN LENGTH(text) BETWEEN 100 AND 5000 THEN 40 ELSE 0 END
              + CASE WHEN CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / LENGTH(text) < 0.10 THEN 30 ELSE 0 END
              + CASE WHEN CAST(len(list_filter({SQL_TOKENS}, x -> x IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
                          / len({SQL_TOKENS}) > 0.01 THEN 30 ELSE 0 END) AS quality,
             {SQL_NORM} AS norm,
             ROW_NUMBER() OVER (PARTITION BY {SQL_NORM} ORDER BY doc_id) AS rn
      FROM documents
      WHERE lang = 'en'
    )
    SELECT doc_id, lang, n_tokens, quality
    FROM scored
    WHERE quality >= 70 AND rn = 1 AND n_tokens BETWEEN 10 AND 2000
    ORDER BY doc_id
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .withColumn("n_tokens", F.size(X.tokens("text")))
        .withColumn("quality", X.quality_score("text"))
        .withColumn("norm", X.normalize_text("text"))
        .withColumn(
            "rn", F.row_number().over(W.partitionBy("norm").orderBy("doc_id"))
        )
        .filter(
            (F.col("quality") >= 70)
            & (F.col("rn") == 1)
            & F.col("n_tokens").between(10, 2000)
        )
        .select("doc_id", "lang", "n_tokens", "quality")
        .orderBy("doc_id")
    )
)


# ---------------------------------------------------------------------------
# Grouped-map applyInPandas: per-user percent-rank normalization. The
# oracle replays it with window percent_rank — proving the pandas path
# produces exactly what the declarative plan would.
# ---------------------------------------------------------------------------

register(
    "pipeline_rank_normalize",
    """
    SELECT user_id, event_id, value,
           percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id) AS value_pct
    FROM events
    ORDER BY user_id, event_id
    """,
)(
    lambda spark, sf_dir: (
        rank_normalize(t(spark, sf_dir, "events")).orderBy("user_id", "event_id")
    )
)
