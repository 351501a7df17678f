"""Deterministic corpus sampling: stratified quotas and train/test splits.

Curation steps for a training-data pipeline: take exactly ``quota``
documents per stratum (language, source, ...) and carve reproducible
train/test splits. Both are driven by ``md5(key)`` rather than an RNG so
the selection is bit-identical across engines, re-runs, and cluster
topologies — TABLESAMPLE / RAND draws depend on partition layout and
cannot be replayed, which disqualifies them for lineage-tracked corpora
(reference delegates sampling to SQL, operators.py:45; we make it a
first-class deterministic op).

Scale notes (100 TB): the split is a pure map-side predicate on a hash
prefix — no shuffle, pushes through the scan. The quota sample windows
per stratum; with few strata each window partition is huge, so
``prefilter_frac`` cheaply pre-thins rows with the same hash ordering
(a hash-prefix filter keeps exactly the lowest-hash rows, which are the
ones row_number would pick) before the per-stratum sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_key",
    "sample_stratified_quota",
    "split_train_test",
    "sample_weighted_bernoulli",
    "sample_priority_topk",
    "dsir_importance_weights",
]


def hash_key(key_col: str | Column) -> Column:
    """Engine-portable ordering hash: lowercase-hex md5 of the key as text."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.md5(c.cast("string"))


def sample_stratified_quota(
    df: DataFrame,
    strata_col: str,
    quota: int,
    key_col: str,
    prefilter_hex: str | None = None,
) -> DataFrame:
    """Exactly ``min(quota, stratum size)`` rows per stratum, chosen as the
    lowest ``md5(key)`` values (ties broken by the key itself).

    ``prefilter_hex``: optional hex-prefix upper bound (e.g. ``"4"`` keeps
    hashes < '4…', ~25% of rows). Sound only if every stratum retains ≥
    quota rows under the filter; it exists to shrink the windowed sort at
    scale, not to change the result.
    """
    h = hash_key(key_col)
    if prefilter_hex is not None:
        df = df.filter(h < F.lit(prefilter_hex))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )


def split_train_test(
    df: DataFrame, key_col: str, test_threshold_hex: str = "14"
) -> DataFrame:
    """Label each row 'test' when the 2-hex-char md5 prefix of its key is
    lexicographically below ``test_threshold_hex``, else 'train'.

    The threshold is a fraction in 256ths: "14" (hex 20) ≈ 7.8% test.
    Fixed-width lowercase hex compares correctly as text, so the same
    predicate runs verbatim in any SQL engine for lineage checks.
    """
    if len(test_threshold_hex) != 2:
        raise ValueError("test_threshold_hex must be exactly 2 hex chars")
    prefix = F.substring(hash_key(key_col), 1, 2)
    return df.withColumn(
        "split",
        F.when(prefix < F.lit(test_threshold_hex), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def sample_weighted_bernoulli(
    df: DataFrame,
    weight_col: str | Column,
    rate_denom: int = 100_000,
    key_col: str = "doc_id",
    salt: str = ":wsample",
) -> DataFrame:
    """Deterministic weighted Bernoulli (Poisson) sampling: each row is
    included independently with probability ``min(1, weight/rate_denom)``,
    decided by an md5-derived 32-bit uniform of the row key — so the
    sample is reproducible from content alone (no RNG state), stable
    under re-partitioning/retries, and exactly replayable by another
    engine. The inclusion test is 64-bit integer arithmetic against a
    fixed-point threshold::

        u32 * rate_denom  <  2^32 * floor(w) + round(frac(w) * 2^32)

    For integral weights the threshold is exactly ``2^32 * w`` (bit-for-bit
    the historical pure-integer contract); fractional weights quantize the
    fractional part to 1/2^32 — e.g. a 0.7 quality score at the default
    denom samples with probability 0.7/100000, not 0 (a plain
    ``cast("long")`` would floor it to nothing, silently).

    This is the importance-sampling primitive of mixture building: set
    ``weight`` to a quality score, token count, or per-source up/down
    weight and the expected sample composition follows it. Embarrassingly
    parallel — a filter, no shuffle; at 100 TB it runs entirely map-side.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    wl = F.floor(w).cast("long")
    frac = w.cast("double") - wl.cast("double")
    thr = F.lit(1 << 32) * wl + F.round(frac * F.lit(float(1 << 32))).cast("long")
    out = df.withColumn("u32", u32)
    return out.filter(F.col("u32") * F.lit(rate_denom) < thr)


def sample_priority_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = ":prio",
) -> DataFrame:
    """Deterministic priority sampling (Duffield, Lund & Thorup, JACM'07):
    a weighted sample WITHOUT replacement of exactly ``k`` rows.

    Each row gets priority ``q = w/u`` for a uniform ``u``; the k highest
    priorities form the sample (and the (k+1)-st priority is the
    Horvitz-Thompson threshold if unbiased subset-sum estimates are needed
    downstream). Bernoulli sampling (``sample_weighted_bernoulli``) gives a
    *random-sized* sample; priority sampling is the fixed-budget
    counterpart — "exactly k docs, heavy ones preferred" — which is how
    fixed-token-budget corpus subsets are drawn.

    Determinism contract: ``u`` is the md5-derived 32-bit uniform of the
    row key (shifted by +1 into (0, 2^32]), and the priority is computed as
    ``(w * 2^32) div (u32 + 1)`` — pure 64-bit integer arithmetic, so
    ranking is exact, replayable by any engine, and tie-broken by the key.
    The weight column must be integral (the fixed-point contract); a
    fractional weight column raises rather than silently flooring.

    Scale shape: a map-side projection followed by ``ORDER BY … LIMIT k``,
    which Spark plans as TakeOrderedAndProject — per-partition top-k heaps,
    only k rows per partition ever reach the driver-side merge. No shuffle
    of the input.
    """
    dtype = dict(df.dtypes).get(weight_col)
    if dtype in ("float", "double") or (dtype or "").startswith("decimal"):
        raise ValueError(
            f"priority sampling requires an integral weight column; "
            f"{weight_col!r} is {dtype} — pre-quantize it explicitly"
        )
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (
        df.withColumn("u32", u32)
        .withColumn(
            "priority",
            F.expr(f"(CAST({weight_col} AS BIGINT) * 4294967296) div (u32 + 1)"),
        )
        .orderBy(F.col("priority").desc(), F.col(key_col))
        .limit(k)
        .drop("u32")
    )


def dsir_importance_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, arXiv 2302.03169):
    score every document by how much more likely its hashed-unigram bag is
    under the TARGET distribution (rows where ``target_pred`` holds) than
    under the RAW corpus distribution — the data-selection signal used to
    upsample in-domain text from a web-scale crawl.

    Features are md5-hashed token buckets (the hashing trick, ``n_buckets``
    fixed); both distributions get add-one smoothing. Per-token log ratio
    = LN((c_t+1)(T_r+B) / ((c_r+1)(T_t+B))) — one IEEE log of one IEEE
    division of exact int64 products, rounded to 9 dp and summed as exact
    decimals, so the per-doc mean is summation-order independent and
    engine-portable (the corpus determinism recipe).

    Returns (id, carry_cols..., n_tokens, avg_logratio). Plan: one explode
    → one ``n_buckets``-row hash-agg (map-side partial; the model table is
    tiny at any corpus size) → broadcast join back + 1-row totals cross
    join → one per-doc agg. No driver-side state, no Python in the path;
    at 100 TB the bucket-stats table is the only thing that moves between
    stages and it is O(n_buckets), not O(corpus).

    No reference analog (reference is an Airflow ETL shim) — extension
    surface for LLM training-data curation.
    """
    from airflow_postgres_csv_spark.functions import texts as X

    carry = carry_cols or []
    toks = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        target_pred.cast("long").alias("_is_t"),
        F.explode(X.tokens(text_col)).alias("_tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("_tok")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    b = toks.select(id_col, *carry, "_is_t", bucket.alias("_bk"))
    stats = b.groupBy("_bk").agg(
        F.count(F.lit(1)).alias("_c_r"), F.sum("_is_t").alias("_c_t")
    )
    totals = stats.agg(
        F.sum("_c_r").alias("_t_r"), F.sum("_c_t").alias("_t_t")
    )
    lr = F.round(
        F.log(
            ((F.col("_c_t") + 1) * (F.col("_t_r") + n_buckets)).cast("double")
            / ((F.col("_c_r") + 1) * (F.col("_t_t") + n_buckets)).cast("double")
        ),
        9,
    ).cast("decimal(18,9)")
    return (
        b.join(F.broadcast(stats), "_bk")
        .crossJoin(F.broadcast(totals))
        .select(id_col, *carry, lr.alias("_lr"))
        .groupBy(id_col, *carry)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("_lr").cast("double") / F.count(F.lit(1))).alias("avg_logratio"),
        )
    )
