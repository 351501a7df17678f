"""Trained quality/domain classifier for corpus filtering: multinomial
Naive Bayes over hashed bag-of-words features.

The modern LLM-data pipeline filters web text with a LEARNED classifier
(CCNet's LM filter, the DCLM-baseline fastText model); the closed-form
member of that linear-classifier family is multinomial Naive Bayes —
the NB of the public NB-SVM baseline, and the right shape for a
distributed engine: training is ONE hash-aggregate pass (no iterative
optimization to babysit), the model is O(n_buckets), and scoring is a
broadcast join + exact decimal sum (a pure Catalyst projection, no
Python in the path).

- **Features**: md5-hashed token buckets (the engine-portable hashing
  trick shared with DSIR, operators/sampling.py:229), occurrence
  counts.
- **Training**: per-bucket class counts ``c_{b,1}, c_{b,0}`` with
  add-one smoothing give ``llr_b = round(ln((c_b1+1)(T0+B) /
  ((c_b0+1)(T1+B))), 9)`` — one IEEE log of one IEEE division of exact
  int64 products, rounded to 9 dp (DSIR's determinism recipe) — plus
  the class prior ``round(ln(n1/n0), 9)``.
- **Scoring**: ``score = prior + Σ_b cnt_b · llr_b`` — int64 counts ×
  9-dp decimals summed exactly, so the per-doc logit is
  summation-order independent and the DuckDB oracle
  (``text_quality_classifier``) matches bit-for-bit. ``pred`` is the
  logit sign.

At 100 TB: training is one explode → one O(n_buckets)-row hash-agg
(map-side combined — the model table is tiny at any corpus size);
scoring new documents broadcasts that table. Nothing driver-side
scales with the corpus.

No reference analog (the reference is an Airflow ETL shim,
/root/reference/src/airflow_postgres_csv/operators.py:12-98) —
extension surface for LLM training-data curation; recipe follows the
public CCNet / DCLM-baseline / NB-SVM descriptions.
"""

from __future__ import annotations

import math
from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hashed_token_counts",
    "train_quality_classifier",
    "score_documents",
    "save_classifier",
    "load_classifier",
]


def _bucket(tok: Column, n_buckets: int) -> Column:
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % n_buckets
    )


def hashed_token_counts(
    docs: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """``(id, y, b, cnt)`` — md5-bucketed token occurrence counts per
    document. One explode + one hash-agg."""
    from airflow_postgres_csv_spark.functions import texts as X
    from airflow_postgres_csv_spark.operators.localframe import (
        spread_small_input,
    )

    # tokenize + per-token md5 run map-side: spread a one-row-group
    # corpus across the session's cores first (guide §2.5; no-op when
    # input splits >= cores)
    toks = spread_small_input(
        docs.select(F.col(id_col), label.cast("int").alias("y"), text_col)
    ).select(
        id_col,
        "y",
        F.explode(X.tokens(text_col)).alias("_tok"),
    )
    return (
        toks.select(id_col, "y", _bucket(F.col("_tok"), n_buckets).alias("b"))
        .groupBy(id_col, "y", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_quality_classifier(
    docs: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> tuple[dict, DataFrame]:
    """Train the filter model in one distributed pass; returns
    ``(model, scored)`` where ``model = {"llr": {bucket: Decimal},
    "prior": Decimal, "n_buckets": B}`` and ``scored`` is
    ``(id, y, score, pred)`` for the training corpus itself. Apply to
    NEW corpora with ``score_documents``."""
    feats = hashed_token_counts(
        docs, label, id_col, text_col, n_buckets
    ).localCheckpoint()
    # O(n_buckets) model aggregate: class token totals per bucket
    stats = feats.groupBy("b").agg(
        F.sum(F.col("cnt") * F.col("y")).alias("c1"),
        F.sum(F.col("cnt") * (1 - F.col("y"))).alias("c0"),
    )
    totals = stats.agg(
        F.sum("c1").alias("t1"), F.sum("c0").alias("t0")
    ).first()
    t1, t0 = int(totals["t1"]), int(totals["t0"])
    llr_expr = F.round(
        F.log(
            ((F.col("c1") + 1) * (t0 + n_buckets)).cast("double")
            / ((F.col("c0") + 1) * (t1 + n_buckets)).cast("double")
        ),
        9,
    ).cast("decimal(18,9)")
    llr = {
        int(r["b"]): r["llr"]
        for r in stats.select("b", llr_expr.alias("llr")).collect()
    }
    # unseen buckets score the smoothing-only ratio (c1 = c0 = 0)
    default = Decimal(
        str(
            round(math.log((t0 + n_buckets) / (t1 + n_buckets)), 9)
        )
    )
    for b in range(n_buckets):
        llr.setdefault(b, default)
    counts = feats.select(id_col, "y").distinct().groupBy("y").count()
    by = {r["y"]: r["count"] for r in counts.collect()}
    n1, n0 = by.get(1, 0), by.get(0, 0)
    if not n1 or not n0:
        raise ValueError("training labels are single-class")
    prior = Decimal(str(round(math.log(n1 / n0), 9)))
    model = {"llr": llr, "prior": prior, "n_buckets": n_buckets}
    return model, _score_feats(feats, model, id_col)


def _score_feats(feats: DataFrame, model: dict, id_col: str) -> DataFrame:
    from airflow_postgres_csv_spark.operators.localframe import arrow_local_df

    spark = feats.sparkSession
    wdf = arrow_local_df(
        spark,
        [(b, v) for b, v in model["llr"].items()],
        "b long, llr decimal(18,9)",
    )
    return (
        feats.join(F.broadcast(wdf), "b")
        .groupBy(id_col)
        .agg(
            F.first("y").alias("y"),
            # cnt pinned to DECIMAL(10,0): long × decimal(18,9) would
            # exceed Spark's 38-digit cap and silently shrink the scale;
            # (10,0)×(18,9) stays exact at scale 9 in both engines
            # the SUM result is decimal(38,9); adding the prior would
            # push precision past 38 and Spark silently drops to scale 8
            # — cast down first (|logit| is O(100), 28 digits is plenty)
            (
                F.sum(F.col("cnt").cast("decimal(10,0)") * F.col("llr"))
                .cast("decimal(28,9)")
                + F.lit(model["prior"]).cast("decimal(18,9)")
            ).alias("_z"),
        )
        .select(
            id_col,
            "y",
            F.col("_z").cast("double").alias("score"),
            (F.col("_z") >= 0).cast("int").alias("pred"),
        )
    )


def score_documents(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score NEW documents under a trained model: one explode + one
    hash-agg + one broadcast join — the corpus-filtering hot path.
    Returns ``(id, score, pred)``."""
    feats = hashed_token_counts(
        docs, F.lit(0), id_col, text_col, model["n_buckets"]
    )
    return _score_feats(feats, model, id_col).drop("y")


def save_classifier(spark, model: dict, root: str) -> dict:
    """Persist the model as a versioned snapshot table (the persisted-
    index pattern of operators/similarity.py / text_index.py): the
    O(n_buckets) llr table is the data, prior/n_buckets ride the
    manifest ``extra``. Retraining commits a new version — serving pins
    any generation via time travel; returns the manifest."""
    from airflow_postgres_csv_spark.operators.localframe import arrow_local_df
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_commit

    wdf = arrow_local_df(
        spark,
        sorted((b, v) for b, v in model["llr"].items()),
        "b long, llr decimal(18,9)",
    ).coalesce(1)
    return snapshot_commit(
        wdf, root, mode="overwrite",
        extra={"classifier": {
            "prior": str(model["prior"]), "n_buckets": model["n_buckets"],
        }},
    )


def load_classifier(spark, root: str, version: int | str | None = None) -> dict:
    """Load a pinned model generation; exact round trip of
    ``save_classifier`` (decimals survive bit-for-bit)."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        resolve_version,
        snapshot_read,
        snapshot_versions,
    )

    v = resolve_version(root, version)
    if v is None:
        v = snapshot_versions(root)[-1]
    meta = _load_manifest(root, v)["classifier"]
    llr = {
        int(r["b"]): r["llr"]
        for r in snapshot_read(spark, root, version=v).collect()
    }
    return {
        "llr": llr,
        "prior": Decimal(meta["prior"]),
        "n_buckets": int(meta["n_buckets"]),
    }
