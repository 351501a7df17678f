"""Data-quality audit primitives: the dbt-test battery, engine-side.

A warehouse user of the reference runs these as SQL checks before/after
every load (`operators.py:80` pushes arbitrary SELECTs server-side); here
they are first-class operators returning one summary row per check so a
100 TB audit is a handful of aggregate-only jobs:

- ``fk_orphans`` — child keys with no parent (left join against the
  distinct parent key set — broadcast when dim-sized, shuffled otherwise —
  folded straight into a 1-row aggregate; the orphan rows themselves are
  never materialized).
- ``dup_pk_count`` — rows beyond the first per primary key (hash-agg of a
  hash-agg, both map-side partial).
- ``null_key_count`` — NULL keys (map-only conditional count).

Every function returns a LAZY 1-row ``(n_bad, n_total)`` DataFrame — no
driver-side action; ``audit_checks`` unions them into one relation
``(check_name, n_bad, n_total, ok)`` that a single collect evaluates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fk_orphans", "dup_pk_count", "null_key_count", "audit_checks"]


def fk_orphans(child: DataFrame, key: str, parent: DataFrame, pkey: str) -> DataFrame:
    """Lazy 1-row ``(n_bad, n_total)``: child rows whose ``key`` has no
    parent. NULL child keys are not orphans (SQL FK semantics) — count
    them separately with :func:`null_key_count`."""
    hits = (
        parent.select(F.col(pkey).alias(key))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        child.select(key)
        .join(hits, key, "left")
        .agg(
            F.count(
                F.when(F.col(key).isNotNull() & F.col("_hit").isNull(), 1)
            ).alias("n_bad"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


def dup_pk_count(df: DataFrame, keys: list[str]) -> DataFrame:
    """Lazy 1-row ``(n_bad, n_total)``: rows beyond the first per key tuple."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    return per_key.agg(
        (F.sum("_n") - F.count(F.lit(1))).cast("long").alias("n_bad"),
        F.sum("_n").cast("long").alias("n_total"),
    )


def null_key_count(df: DataFrame, key: str) -> DataFrame:
    return df.agg(
        F.count(F.when(F.col(key).isNull(), 1)).alias("n_bad"),
        F.count(F.lit(1)).alias("n_total"),
    )


def audit_checks(named: dict[str, DataFrame]) -> DataFrame:
    """Union 1-row check results into ``(check_name, n_bad, n_total, ok)``."""
    out = None
    for name, df in named.items():
        r = df.select(
            F.lit(name).alias("check_name"),
            "n_bad",
            "n_total",
            (F.col("n_bad") == 0).cast("int").alias("ok"),
        )
        out = r if out is None else out.unionByName(r)
    return out
