"""Document chunking: fixed-size overlapping token windows per document.

The unit step between a raw corpus and an embedding/training pipeline
(context-window packing, RAG chunking). Pure JVM expressions — tokenize
once per document (generator-barrier let-binding, see
texts.ngrams_of_tokens for the CollapseProject trap), then
``posexplode`` the chunk array. No shuffle, no Python: chunking 100 TB
is a map-only stage that scales with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.functions import texts as X

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``.

    Output: (id, chunk_idx, chunk_text, n_tokens) — ``n_tokens`` is the
    actual window size (the last chunk may be short). A document shorter
    than one window yields exactly one chunk; chunk i covers tokens
    ``[i*stride, i*stride + chunk_tokens)``.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    c, s = F.lit(chunk_tokens), F.lit(stride)

    # one row per doc with the token array materialized by the generator
    toks = df.select(
        id_col, F.explode(F.array(X.tokens(text_col))).alias("_tk")
    )
    n = F.size("_tk")
    n_chunks = F.when(n <= c, F.lit(1)).otherwise(
        F.floor((n - c + s - F.lit(1)) / s).cast("int") + F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.struct(
            F.concat_ws(" ", F.slice(F.col("_tk"), i * s + 1, chunk_tokens)).alias(
                "txt"
            ),
            F.least(c, n - i * s).alias("n"),
        ),
    )
    return toks.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "_c")
    ).select(
        id_col,
        "chunk_idx",
        F.col("_c.txt").alias("chunk_text"),
        F.col("_c.n").alias("n_tokens"),
    )
