"""Query corpus registry.

Every capability from SURVEY.md §2 is registered here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) a DuckDB oracle SQL string computing the same result on the
same parquet tables. The driver (and our local verifier in
``tools/verify_local.py``) runs both and compares row-count + schema +
order-insensitive value hash.

Determinism rules for oracle-checked queries (see SURVEY.md §7 traps):

- Fixture doubles are exactly 2-decimal, so aggregates go through
  ``DECIMAL`` so both engines compute *bit-identical* doubles (decimal
  arithmetic is exact; decimal→double conversion is the same IEEE
  operation in both). Never compare raw float sums — summation order
  differs between engines.
- Timestamps in output are formatted to strings (engine-neutral hashing).
- Every computed column is aliased identically in Spark and SQL; ties in
  top-k queries are broken by a unique key column.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    "relational",
    "joins",
    "windows",
    "functions_sql",
    "etl_queries",
    "text_queries",
    "dedup_queries",
    "similarity_queries",
    "events_queries",
    "multimodal_queries",
    "advanced_sql",
    "temporal_queries",
    "tpch_more",
    "rollup_queries",
    "streaming_live",
    "pipeline_queries",
    "sampling_queries",
)


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL op)


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and its DuckDB oracle) to the corpus."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle)
        return fn

    return deco


def _load_all() -> None:
    for mod in _MODULES:
        importlib.import_module(f"{__package__}.{mod}")


def registry() -> dict[str, RegisteredQuery]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: rq.fn for n, rq in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {n: rq.oracle for n, rq in registry().items() if rq.oracle is not None}
