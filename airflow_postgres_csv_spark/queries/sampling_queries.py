"""Deterministic sampling queries (operators/sampling.py), oracle-checked:
stratified per-language quotas and reproducible train/test splits over the
documents corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators import sampling as S
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import t

SQL_H = "md5(CAST(doc_id AS VARCHAR))"


register(
    "sample_stratified_lang",
    f"""
    WITH ranked AS (
        SELECT doc_id, lang, source,
               row_number() OVER (PARTITION BY lang ORDER BY {SQL_H}, doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, lang, source FROM ranked WHERE rn <= 40 ORDER BY doc_id
    """,
)(
    lambda spark, sf_dir: (
        S.sample_stratified_quota(
            t(spark, sf_dir, "documents").select("doc_id", "lang", "source"),
            strata_col="lang",
            quota=40,
            key_col="doc_id",
        ).orderBy("doc_id")
    )
)


register(
    "split_train_test_counts",
    f"""
    SELECT lang,
           CASE WHEN substr({SQL_H}, 1, 2) < '14' THEN 'test' ELSE 'train' END AS split,
           count(*) AS n_docs
    FROM documents
    GROUP BY lang, split
    ORDER BY lang, split
    """,
)(
    lambda spark, sf_dir: (
        S.split_train_test(t(spark, sf_dir, "documents"), key_col="doc_id")
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "split")
    )
)
