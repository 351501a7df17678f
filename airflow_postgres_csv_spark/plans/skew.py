"""Skew mitigation: deterministic key salting for aggregations and joins.

AQE's skew-join splitting handles *detected* skew at runtime; these helpers
are for skew you know about up front (power-law keys, null-heavy join
columns) where pre-planned salting avoids the straggler ever forming.
Salts are derived with ``xxhash64`` from caller-named columns — fully
deterministic, so results are reproducible and retried tasks recompute
identical partitions (no ``rand()`` in the lineage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_agg", "replicated_skew_join"]


def with_salt(df: DataFrame, salt_cols: list[str], n_salts: int, out: str = "_salt") -> DataFrame:
    """Add a deterministic salt in [0, n_salts) hashed from ``salt_cols``
    (pick columns that vary within a hot key — a row id, a timestamp)."""
    return df.withColumn(out, F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    ``aggs`` maps output name → (merge_fn_name, partial_expr): phase 1
    groups by (keys + salt) computing ``partial_expr``; phase 2 groups by
    keys merging partials with ``merge_fn_name`` (sum/min/max — the
    re-aggregable ones; express avg as sum+count and divide after).

    Phase 1 splits a hot key across ``n_salts`` reducers, so no single
    task ever sees more than ~1/n_salts of the key's rows; phase 2 then
    merges just ``n_salts`` partial rows per key. (Spark's hash aggregate
    already does map-side partials; salting additionally bounds the
    *reduce*-side per-task load, which is what a power-law key overwhelms.)
    """
    salted = with_salt(df, salt_cols, n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (_, expr) in aggs.items()]
    )
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    return phase1.groupBy(*keys).agg(
        *[merge[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def replicated_skew_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_cols: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` is large and skewed on ``on``: salt the
    left side, replicate each right row across all ``n_salts`` salt values
    (explode — right must be the smaller side), and join on keys + salt.

    Cost: right side grows n_salts×, but each (key, salt) reduce bucket
    shrinks n_salts× — the classic trade for hot keys too big for one task
    yet too many for a broadcast join.

    Only left-preserving joins are allowed: with the right side replicated
    ``n_salts`` times, a right/full outer join would emit every unmatched
    right row once per salt value (duplicate output rows).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"replicated_skew_join supports left-preserving joins only "
            f"(got {how!r}): the replicated right side would duplicate "
            f"unmatched right rows in right/full outer joins"
        )
    salted_left = with_salt(left, salt_cols, n_salts)
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_left.join(replicated_right, [*on, "_salt"], how)
    return joined.drop("_salt")
