"""Merge / upsert: key-matched replace-or-insert over DataFrames.

The reference's only load semantics are append and truncate-load
(reference operators.py:116, 175-177); a corpus that is continuously
re-crawled needs the third: upsert by key. Parquet is immutable, so the
operator produces the merged dataset (caller rewrites the partition or
table — pair with ``operators/dataset.py`` partitioned writes so only
affected partitions rewrite).

Scale: one shuffle each side on the merge key (the anti-join), identical
to what a MERGE INTO does in Delta/Iceberg minus the transaction log.
Broadcast the source side automatically when it is small (the common
incremental-batch case) by leaving it under the session's
autoBroadcastJoinThreshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["merge_upsert"]


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Rows from ``source`` win on key collision; unmatched target rows kept.

    Both inputs must share a schema (enforced by ``unionByName``). The
    result has no duplicate keys iff the inputs individually have none.
    """
    survivors = target.join(source.select(*keys), on=keys, how="left_anti")
    return source.unionByName(survivors)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Snapshot diff → ``(*keys, diff_status)`` for every key where the
    two table versions differ: ``'added'`` (key only in ``new``),
    ``'removed'`` (only in ``old``), ``'changed'`` (present in both with
    any non-key column differing). Unchanged keys are not emitted.

    The change test is a null-safe column-by-column comparison (NULL vs
    NULL is unchanged, NULL vs value is a change) — no row-hash, so no
    hash-collision false negatives and no serialization-format coupling.

    Scale shape: one full outer equi-join on the key — the same single
    shuffle as the merge/upsert it audits; the comparison is a map-side
    projection. This is the reconciliation primitive for incremental-load
    pipelines (did the load change exactly the rows it claimed to?).

    Both inputs must be unique per key (pre-aggregate otherwise), and
    must share the same schema.
    """
    from pyspark.sql import functions as F

    if old.columns != new.columns:
        raise ValueError(
            f"schemas differ: {old.columns} vs {new.columns}"
        )
    value_cols = [c for c in old.columns if c not in keys]
    # Null-safe key equality + explicit presence markers: with plain `==` a
    # row whose key is NULL in both snapshots never matches and is emitted
    # as both 'added' and 'removed' (ADVICE r4), and keys[0].isNotNull()
    # would misread such a row as absent.
    o = old.withColumn("__in_old", F.lit(True)).alias("__o")
    n = new.withColumn("__in_new", F.lit(True)).alias("__n")
    cond = None
    for k in keys:
        c = F.col(f"__o.{k}").eqNullSafe(F.col(f"__n.{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    in_old = F.col("__o.__in_old").isNotNull()
    in_new = F.col("__n.__in_new").isNotNull()
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(f"__o.{c}").eqNullSafe(F.col(f"__n.{c}"))
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    key_out = [
        F.coalesce(F.col(f"__o.{k}"), F.col(f"__n.{k}")).alias(k) for k in keys
    ]
    return (
        j.select(*key_out, status.alias("diff_status"))
        .where(F.col("diff_status").isNotNull())
    )
