"""Embedding generation over text columns — the model-inference shape of
an LLM-data pipeline.

Real models aren't in this environment, so :func:`embed_texts` ships a
deterministic fake embedder (md5-nibble features) with the REAL pipeline
shape: a vectorized Arrow-batched pandas UDF, one model invocation per
batch, output `array<double>`. Swapping in a real encoder changes only the
`_encode_batch` body (and would hold the model per-executor-process, which
is exactly what the pandas-UDF batch shape is for); the gated
:func:`embed_texts_real` marks that path.

100 TB notes: embedding generation is embarrassingly parallel (no
shuffle); batch size is the Arrow batch (`spark.sql.execution.arrow.
maxRecordsPerBatch`) — size it to the model's optimal batch. The output
column feeds straight into operators/similarity.py (ANN) and
operators/dedup.py (embedding near-dup).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["embed_texts", "embed_texts_real", "fake_embedding"]


def fake_embedding(text: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in features: md5 hex nibbles scaled to [0, 1].

    Chosen because an independent engine can replay it in SQL
    (strpos('0123..f', substr(md5(text), j, 1)) - 1) / 15.0 — so even the
    fake path is differential-testable end to end.
    """
    h = hashlib.md5(text.encode()).hexdigest()
    return [int(h[j], 16) / 15.0 for j in range(dim)]


def embed_texts(
    df: DataFrame, text_col: str = "text", dim: int = 8, out: str = "embedding"
) -> DataFrame:
    """Append an embedding column computed by a vectorized pandas UDF."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _encode_batch(texts: pd.Series) -> pd.Series:
        # a real encoder would run model.encode(texts.tolist()) here
        return texts.map(lambda s: fake_embedding(s, dim))

    return df.withColumn(out, _encode_batch(F.col(text_col)))


# One model per executor Python process: module globals are per-process, so
# this cache is exactly the "load once per worker" contract.
_MODEL_CACHE: dict[str, object] = {}


def _encode_texts_batch(
    texts: list[str],
    model_name: str,
    batch_size: int,
    cache: dict[str, object] | None = None,
) -> list[list[float]]:
    """Executor-side batch encode: lazy per-process model singleton + one
    ``model.encode`` call per Arrow batch. Kept as a plain function so the
    contract is unit-testable with a stubbed ``sentence_transformers``
    module (no network / model download)."""
    import sentence_transformers as st

    cache = _MODEL_CACHE if cache is None else cache
    model = cache.get(model_name)
    if model is None:
        model = cache[model_name] = st.SentenceTransformer(model_name)
    vecs = model.encode(texts, batch_size=batch_size, show_progress_bar=False)
    return [list(map(float, v)) for v in vecs]


def embed_texts_real(
    df: DataFrame,
    model_name: str = "all-MiniLM-L6-v2",
    text_col: str = "text",
    out: str = "embedding",
    batch_size: int = 64,
) -> DataFrame:
    """Real model inference via sentence-transformers (fully wired; gated
    only on the library being importable — it is not in this container).

    The model loads lazily ONCE per executor Python process (module-level
    cache keyed by model name) and encodes each Arrow batch in one
    ``model.encode`` call — the standard per-process-model, per-batch-
    inference shape. Same signature/output type as :func:`embed_texts`,
    so downstream ANN/dedup operators take either path unchanged.
    """
    try:
        import sentence_transformers  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real embedding inference requires sentence-transformers, "
            "not available in this container; use embed_texts "
            "(deterministic fake) instead"
        ) from exc

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _encode_batch(texts: pd.Series) -> pd.Series:
        return pd.Series(_encode_texts_batch(texts.tolist(), model_name, batch_size))

    return df.withColumn(out, _encode_batch(F.col(text_col)))
