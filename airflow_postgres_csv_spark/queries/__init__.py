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
import json
import re
from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

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
    "udf_queries",
    "mining_queries",
    "snapshot_queries",
    "cluster_queries",
)


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL op)


_REGISTRY: dict[str, RegisteredQuery] = {}

# The driver's correctness gate samples the FIRST 50 registered queries, so
# registration order is part of the contract. The 50-name window is
# ANCHORS + a deterministic ROTATION:
#
# - ``_ANCHORS`` — one representative per coarse SURVEY.md §2 family, pinned
#   every round so each family always has a fresh driver-verified
#   CORRECTNESS row.
# - The remaining ``50 - len(_ANCHORS)`` slots are filled with names that
#   have NEVER appeared in any committed ``CORRECTNESS_r*.json`` (sorted by
#   name), so the whole corpus accumulates driver-grade evidence across
#   rounds instead of re-grading the same 50 forever. Once every query has
#   been graded at least once, slots refill with the LEAST-RECENTLY graded
#   names (by last round seen, then name) — a stable round-robin.
#
# The schedule is a pure function of the committed CORRECTNESS files, so it
# advances exactly once per round and is reproducible from a checkout.
# Everything outside the window stays covered by tools/verify_local.py
# (same rows+schema+hash methodology, run locally over all queries).
_WINDOW_SIZE = 50

_ANCHORS: tuple[str, ...] = (
    "q1_pricing_summary",  # §2.2 scan/agg/sort (TPC-H q1)
    "q9_nation_profit",  # §2.2 multi-way joins
    "agg_grouping_sets",  # §2.2 advanced aggregation
    "window_topk_per_group",  # §2.2 window functions
    "recursive_month_spine",  # §2.2 subqueries/CTE/recursive
    "string_funcs",  # §2.2 scalar string/regexp fns
    "array_funcs",  # §2.2 array/map/json/lambda fns
    "cast_funcs",  # §2.2 conditional/null/cast + ANSI opt-outs
    "csv_roundtrip_dialect",  # §2.1 ETL CSV surface
    "dedup_minhash_lsh",  # §2.3 dedup family
    "similarity_topk_bruteforce",  # §2.3 similarity search
    "text_tfidf_topk",  # §2.3 text analysis
    "streaming_session_live",  # §2.3 structured streaming
    "events_sessionization",  # §2.3 events/temporal
    "multimodal_decode_meta",  # §2.3 multimodal columns
    # (the six round-5 re-grade pins were dropped after their green r5
    # CORRECTNESS rows, per the one-green-round contract — the freed slots
    # go to the never-driver-graded rotation backlog.)
)


def _correctness_history() -> dict[str, int]:
    """Map query name -> last round number it was driver-graded in.

    Reads the committed ``CORRECTNESS_r*.json`` artifacts at the repo root;
    returns {} when none are present (fresh checkout), in which case the
    rotation is simply the alphabetical head of the non-anchor corpus.
    """
    root = Path(__file__).resolve().parents[2]
    last: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            graded = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(graded, dict):
            continue
        for name in graded:
            last[name] = max(rnd, last.get(name, 0))
    return last


def _first_verified_round() -> dict[str, int]:
    """Map query name -> first round it appeared in a committed
    ``VERIFY_LOCAL_r*.txt`` local-verification report (the corpus
    seniority record; {} on a fresh checkout)."""
    root = Path(__file__).resolve().parents[2]
    first: dict[str, int] = {}
    for path in sorted(root.glob("VERIFY_LOCAL_r*.txt")):
        m = re.search(r"_r(\d+)\.txt$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            lines = path.read_text().splitlines()
        except OSError:
            continue
        for line in lines:
            parts = line.split()
            if len(parts) >= 2 and parts[0] in ("PASS", "FAIL", "ERR"):
                name = parts[1].rstrip(":")
                if name not in first:
                    first[name] = rnd
    return first


# Flagship-first rotation priority (VERDICT r7 item 1). The never-graded
# backlog was dominated by the newest, highest-risk subsystems (the whole
# snapshot/catalog/CDC/IVM stack, persisted ANN + BM25 indexes, MERGE INTO,
# SemDeDup/DSIR/k-means/RRF) because the old tiebreak was FIFO by corpus
# seniority — the riskiest code got driver-graded LAST. Ties among equally
# recently graded names now break by an explicit subsystem priority (first
# matching prefix wins; unlisted names sort after every listed subsystem),
# then by seniority NEWEST-first, then by name. The never-graded-before-
# ever-graded invariant and the bounded-drain starvation guard are
# unchanged: the primary key is still the last graded round.
_ROTATION_PRIORITY: tuple[str, ...] = (
    "snapshot_",             # versioned snapshots, catalog, MERGE INTO, CDC/IVM
    "pipeline_snapshot_",    # medallion / CDC-stream pipelines over snapshots
    "pipeline_expectations_",  # expectations + quarantine (snapshot-backed)
    "streaming_snapshot_",   # live change feeds over snapshot tables
    "streaming_merge_",      # streaming MERGE INTO sink
    "streaming_catalog_",    # catalog-atomic streaming expectations
    "similarity_ann_",       # persisted IVF/PQ ANN indexes
    "text_index_",           # persisted BM25 inverted index
    "search_",               # hybrid RRF + NDCG eval
    "cluster_",              # distributed k-means
    "sample_",               # DSIR / temperature / priority sampling
    "split_",                # exact stratified splits
    "dedup_semantic_",       # SemDeDup
)


def _priority_rank(name: str) -> int:
    """Index of the first matching subsystem prefix (lower = graded
    sooner); names outside every listed subsystem rank after all of them."""
    for i, prefix in enumerate(_ROTATION_PRIORITY):
        if name.startswith(prefix):
            return i
    return len(_ROTATION_PRIORITY)


def _rotation_sort_key(
    last: dict[str, int], seniority: dict[str, int]
) -> Callable[[str], tuple]:
    """The rotation's total order, shared with the starvation-guard test:
    (last graded round, subsystem priority, newest-first seniority, name).
    Names with no seniority record at all (registered THIS round, not yet
    in any committed local-verify report) drain AFTER the existing
    never-graded backlog: the backlog is finite and named, while new
    registrations are unbounded — letting them jump the queue would let
    a productive round starve the very names the previous round promised
    to grade next. They join the normal newest-first order as soon as the
    round's verify report is committed."""

    def key(n: str) -> tuple:
        # the no-seniority flag outranks subsystem priority: a freshly
        # registered high-priority name must NOT displace the finite,
        # named backlog the previous round promised to grade next
        return (
            last.get(n, 0),
            n not in seniority,
            _priority_rank(n),
            -seniority.get(n, 0),
            n,
        )

    return key


def priority_window(all_names: list[str]) -> list[str]:
    """The 50 names the driver will grade this round, in order."""
    last = _correctness_history()
    pool = [n for n in all_names if n not in _ANCHORS]
    seniority = _first_verified_round()
    pool.sort(key=_rotation_sort_key(last, seniority))
    window = list(_ANCHORS) + pool[: _WINDOW_SIZE - len(_ANCHORS)]
    return window[:_WINDOW_SIZE]


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
    missing = [n for n in _ANCHORS if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"_ANCHORS names unknown queries: {missing}")
    window = priority_window(list(_REGISTRY))
    ordered = {n: _REGISTRY[n] for n in window}
    ordered.update((n, rq) for n, rq in _REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {n: rq.fn for n, rq in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {n: rq.oracle for n, rq in registry().items() if rq.oracle is not None}
