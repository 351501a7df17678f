"""Decontamination + dedup-cluster queries (SURVEY.md §2.3 extension).

``decontam_overlap`` treats every 10th document as the held-out benchmark
and flags the rest of the corpus for 8-gram overlap — the classic
training-hygiene pass. ``dedup_clusters`` closes the near-dup pair list
into connected components (transitive closure), the step that turns
pairwise similarity into one-survivor-per-cluster dedup; the DuckDB
oracle computes the same closure with a recursive CTE, independently of
the Spark label-propagation implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from airflow_postgres_csv_spark.operators import decontam as DC
from airflow_postgres_csv_spark.operators import dedup as D
from airflow_postgres_csv_spark.operators.graph import connected_components
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import t
from airflow_postgres_csv_spark.queries.dedup_queries import (
    _NGRAM_DF_CAP,
    _SQL_SHINGLES_CAPPED,
    SQL_TOKENS,
)


def decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return DC.contaminated_docs(train, bench, n=8).orderBy("doc_id")


register(
    "decontam_overlap",
    f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS tk FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(tk) - 6),
                    i -> list_aggregate(tk[i:i+7], 'string_agg', ' '))) AS s
      FROM toks
    ),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0)
    SELECT c.doc_id, COUNT(*) AS n_overlap
    FROM sh c JOIN bench b ON c.s = b.s
    WHERE c.doc_id % 10 <> 0
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """,
)(decontam_overlap)


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    edges = D.ngram_jaccard_pairs(
        docs, threshold=0.5, max_shingle_df=_NGRAM_DF_CAP
    ).select("id_a", "id_b")
    assign = connected_components(
        edges, docs.select("doc_id"), src="id_a", dst="id_b", id_col="doc_id"
    )
    return (
        assign.withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
        .orderBy("doc_id")
    )


register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_SQL_SHINGLES_CAPPED},
    edges AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM cshingles a
      JOIN cshingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      JOIN csizes sa ON sa.doc_id = a.doc_id
      JOIN csizes sb ON sb.doc_id = b.doc_id
      GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
      HAVING CAST(COUNT(*) AS DOUBLE) / (sa.n + sb.n - COUNT(*)) >= 0.5
    ),
    sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
    walk(node, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT s.v, w.root FROM walk w JOIN sym s ON s.u = w.node
    ),
    assign AS (
      SELECT node AS doc_id, MIN(root) AS cluster_id FROM walk GROUP BY node
    )
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM assign
    ORDER BY doc_id
    """,
)(dedup_clusters)


# ---------------------------------------------------------------------------
# Incremental ingestion dedup: every 10th document plays the incoming
# batch; the rest is the standing corpus. Rejected = incoming docs whose
# normalized-text fingerprint already exists in the corpus. The corpus
# reduces to a (fingerprint -> min id) table first — content-addressed, so
# on a real pipeline it persists between ingestion runs and only appends.
# ---------------------------------------------------------------------------

register(
    "dedup_incremental_rejects",
    """
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS k
      FROM documents
    ),
    corpus AS (
      SELECT k, MIN(doc_id) AS matched_corpus_id
      FROM fp WHERE doc_id % 10 <> 0 GROUP BY k
    )
    SELECT n.doc_id, c.matched_corpus_id
    FROM (SELECT * FROM fp WHERE doc_id % 10 = 0) n
    JOIN corpus c USING (k)
    ORDER BY n.doc_id
    """,
)(
    lambda spark, sf_dir: (
        D.incremental_exact_matches(
            t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0),
            t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 != 0),
        ).orderBy("doc_id")
    )
)


# ---------------------------------------------------------------------------
# Survivor selection: connected components close near-dup pairs into
# clusters; each cluster keeps its best document (longest text, ties by
# lowest id). The output is the doc -> survivor mapping the rewrite/drop
# pass consumes. Window over cluster_id — one extra small shuffle on top
# of the clustering itself.
# ---------------------------------------------------------------------------


def dedup_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    edges = D.ngram_jaccard_pairs(
        docs, threshold=0.5, max_shingle_df=_NGRAM_DF_CAP
    ).select("id_a", "id_b")
    assign = connected_components(
        edges, docs.select("doc_id"), src="id_a", dst="id_b", id_col="doc_id"
    )
    ranked = assign.join(docs.select("doc_id", "n_chars"), "doc_id").withColumn(
        "survivor_id",
        F.first("doc_id").over(
            Window.partitionBy("cluster_id").orderBy(
                F.col("n_chars").desc(), F.col("doc_id").asc()
            )
        ),
    )
    return ranked.select(
        "doc_id",
        "cluster_id",
        "survivor_id",
        (F.col("doc_id") == F.col("survivor_id")).cast("int").alias("is_survivor"),
    ).orderBy("doc_id")


register(
    "dedup_cluster_survivors",
    f"""
    WITH RECURSIVE {_SQL_SHINGLES_CAPPED},
    edges AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM cshingles a
      JOIN cshingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      JOIN csizes sa ON sa.doc_id = a.doc_id
      JOIN csizes sb ON sb.doc_id = b.doc_id
      GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
      HAVING CAST(COUNT(*) AS DOUBLE) / (sa.n + sb.n - COUNT(*)) >= 0.5
    ),
    sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
    walk(node, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT s.v, w.root FROM walk w JOIN sym s ON s.u = w.node
    ),
    assign AS (
      SELECT node AS doc_id, MIN(root) AS cluster_id FROM walk GROUP BY node
    ),
    ranked AS (
      SELECT a.doc_id, a.cluster_id,
             FIRST_VALUE(a.doc_id) OVER (
               PARTITION BY a.cluster_id
               ORDER BY d.n_chars DESC, a.doc_id ASC
             ) AS survivor_id
      FROM assign a JOIN documents d USING (doc_id)
    )
    SELECT doc_id, cluster_id, survivor_id,
           CAST(doc_id = survivor_id AS INT) AS is_survivor
    FROM ranked
    ORDER BY doc_id
    """,
)(dedup_cluster_survivors)


# ---------------------------------------------------------------------------
# Leakage-safe splits (round 10): the classic eval-hygiene failure is a
# near-duplicate pair straddling train/test — the model "generalizes" to a
# paraphrase of its own training data. The fix is to split by DEDUP CLUSTER,
# not by document: close the near-dup pairs into components, hash the
# CLUSTER id into train/val/test, and let every member inherit the
# cluster's split. ``crossed`` flags the documents a naive per-doc hash
# split would have separated from their near-duplicates — the leakage this
# operator exists to prevent. Scale shape: the banded/capped candidate
# generation and iterative label propagation are the audited
# dedup_clusters path; the split itself is one md5 projection — no new
# shuffles beyond the closure.
# ---------------------------------------------------------------------------


def split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    edges = D.ngram_jaccard_pairs(
        docs, threshold=0.5, max_shingle_df=_NGRAM_DF_CAP
    ).select("id_a", "id_b")
    assign = connected_components(
        edges, docs.select("doc_id"), src="id_a", dst="id_b", id_col="doc_id"
    )
    ch = F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 2)
    dh = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    cluster_split = (
        F.when(ch < "14", F.lit("test"))
        .when(ch < "28", F.lit("val"))
        .otherwise(F.lit("train"))
    )
    naive_split = (
        F.when(dh < "14", F.lit("test"))
        .when(dh < "28", F.lit("val"))
        .otherwise(F.lit("train"))
    )
    w = Window.partitionBy("cluster_id")
    return (
        assign.withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            cluster_split.alias("split"),
            (
                (F.col("cluster_size") > 1)
                & (naive_split != cluster_split)
            ).cast("int").alias("crossed"),
        )
        .orderBy("doc_id")
    )


register(
    "split_cluster_safe",
    f"""
    WITH RECURSIVE {_SQL_SHINGLES_CAPPED},
    edges AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM cshingles a
      JOIN cshingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      JOIN csizes sa ON sa.doc_id = a.doc_id
      JOIN csizes sb ON sb.doc_id = b.doc_id
      GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
      HAVING CAST(COUNT(*) AS DOUBLE) / (sa.n + sb.n - COUNT(*)) >= 0.5
    ),
    sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
    walk(node, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT s.v, w.root FROM walk w JOIN sym s ON s.u = w.node
    ),
    assign AS (
      SELECT node AS doc_id, MIN(root) AS cluster_id FROM walk GROUP BY node
    ),
    sized AS (
      SELECT doc_id, cluster_id,
             COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
             substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) AS ch,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS dh
      FROM assign
    )
    SELECT doc_id, cluster_id, cluster_size,
           CASE WHEN ch < '14' THEN 'test'
                WHEN ch < '28' THEN 'val' ELSE 'train' END AS split,
           CAST(cluster_size > 1 AND
                (CASE WHEN ch < '14' THEN 'test'
                      WHEN ch < '28' THEN 'val' ELSE 'train' END)
                <> (CASE WHEN dh < '14' THEN 'test'
                         WHEN dh < '28' THEN 'val' ELSE 'train' END)
                AS INT) AS crossed
    FROM sized
    ORDER BY doc_id
    """,
)(split_cluster_safe)
