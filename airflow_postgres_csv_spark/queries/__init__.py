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
    "tpch_depth2",
    "rollup_queries",
    "streaming_live",
    "pipeline_queries",
    "sampling_queries",
    "decontam_queries",
    "analytics_queries",
    "scale_queries",
)


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL op)


_REGISTRY: dict[str, RegisteredQuery] = {}

# The driver's correctness gate samples the FIRST 50 registered queries, so
# registration order is part of the contract: this priority window lists one
# (or more) representative per SURVEY.md §2.1/§2.2/§2.3 family so every
# family gets a hard driver-verified CORRECTNESS row each round. Everything
# not named here follows in module registration order and stays covered by
# tools/verify_local.py (same methodology, run locally over all queries).
_PRIORITY: tuple[str, ...] = (
    # §2.2 relational core: scan/sample, filter, agg, approx, sort, sets,
    # subqueries, windows.
    "q1_pricing_summary",
    "scan_hash_sample",
    "filter_project",
    "agg_grouping_sets",
    "approx_percentile_accuracy",
    "sort_limit_topk",
    "set_intersect_all",
    "subquery_exists_correlated",
    "recursive_month_spine",
    "window_topk_per_group",
    # §2.2 joins (inner/outer/lateral + TPC-H depth).
    "join_orders_customer_inner",
    "join_full_outer",
    "q3_shipping_priority",
    "join_lateral_topn",
    "q5_local_supplier_volume",
    "q9_nation_profit",
    # §2.2 scalar-function families.
    "string_funcs",
    "date_funcs",
    "math_funcs_exact",
    "array_funcs",
    "json_funcs",
    "map_funcs",
    "conditional_funcs",
    "cast_funcs",
    "pivot_status_by_flag",
    # §2.1 ETL surface (CSV export/import dialects, JSONL).
    "csv_roundtrip_customer",
    "csv_roundtrip_dialect",
    "jsonl_roundtrip_documents",
    # §2.3 dedup family.
    "dedup_exact_documents",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    # §2.3 similarity search.
    "similarity_topk_bruteforce",
    "similarity_ann_lsh_recall",
    "similarity_ann_ivf_recall",
    # §2.3 text analysis / chunking / packing.
    "text_lang_id",
    "text_tfidf_topk",
    "text_chunk_windows",
    "text_repetition",
    "text_pack_sequences",
    # §2.3 events, live streaming, temporal, merge, rollup.
    "events_sessionization",
    "streaming_session_live",
    "join_asof_last_click",
    "join_range_interval_overlap",
    "merge_upsert_customer",
    "rollup_gapfill_locf",
    # §2.3 multimodal, embedding pipeline, sampling.
    "multimodal_decode_meta",
    "pipeline_embed_texts",
    "sample_stratified_lang",
)


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
    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names unknown queries: {missing}")
    ordered = {n: _REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, rq) for n, rq in _REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {n: rq.fn for n, rq in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {n: rq.oracle for n, rq in registry().items() if rq.oracle is not None}
