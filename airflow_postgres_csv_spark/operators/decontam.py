"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark corpus by shared word n-grams.

The standard LLM-training hygiene pass (GPT-3 used 13-gram overlap;
shorter n for short-document corpora): any training document sharing at
least one n-gram with any benchmark document is contaminated and gets
dropped or audited. Extension surface (SURVEY.md §2.3) — the reference
has no analog.

Scale shape: distinct n-gram shingles per side, join on an 8-byte
``xxhash64`` of the shingle (fixed-width key, uniform distribution), count
distinct shared shingles per training doc. The benchmark side is normally
tiny relative to the corpus — AQE broadcasts it from runtime stats — and
the training side streams through one explode + one shuffle. Never N×M on
documents; the join is on the shingle bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.functions import texts as X

__all__ = ["contaminated_docs"]


def contaminated_docs(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """(id, n_overlap): training docs sharing ≥1 word ``n``-gram with any
    benchmark text, with the count of distinct shared shingles.

    Tokenization matches the dedup family (``texts.tokens``), so the same
    normalization governs both pipelines.
    """
    bcol = bench_text_col or text_col
    c_sh = (
        df.withColumn("_toks", X.tokens(text_col))
        .select(
            id_col,
            F.explode(X.ngrams_of_tokens(F.col("_toks"), n)).alias("shingle"),
        )
        .select(id_col, F.xxhash64("shingle").alias("h"))
        .distinct()
    )
    b_sh = (
        benchmark.withColumn("_toks", X.tokens(bcol))
        .select(F.explode(X.ngrams_of_tokens(F.col("_toks"), n)).alias("shingle"))
        .select(F.xxhash64("shingle").alias("h"))
        .distinct()
    )
    return (
        c_sh.join(b_sh, "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
