"""Physical-plan introspection helpers.

The 100 TB posture is only real if the plans prove it: filters reach the
parquet scan, small dimensions broadcast, bucketed joins skip their
shuffles, hot paths stay inside whole-stage codegen. These helpers turn
those properties into assertions (tests/test_plans.py) instead of hopes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "formatted_plan",
    "pushed_filters",
    "read_schema",
    "has_broadcast_join",
    "broadcast_hint_count",
    "num_shuffles",
    "final_plan",
    "codegen_stage_count",
]


def physical_plan(df: DataFrame) -> str:
    """The (initial) executed plan as a string. Under AQE this is the
    pre-runtime plan — exactly what static assertions should look at.
    After execution, AdaptiveSparkPlan's toString repeats the tree as
    "Current Plan" + "Initial Plan"; keep only the first to avoid
    double-counting nodes."""
    text = df._jdf.queryExecution().executedPlan().toString()
    return text.split("+- == Initial Plan ==")[0]


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text (node tree + per-node details, including
    PushedFilters / ReadSchema on scans)."""
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All data-source-pushed filters across the plan's scans."""
    text = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column names each scan actually reads (post column-pruning)."""
    text = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit broadcast hints in the analyzed logical plan.

    A forced ``F.broadcast`` overrides AQE's size threshold, so at scale it
    is only safe on constant-size dims (nation/region) or provably tiny
    filtered sides. Tests pin the hint budget per query so a fact-scale
    hint can't sneak back in (AQE still auto-broadcasts small sides from
    runtime stats — that path needs no hint)."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return analyzed.count("ResolvedHint (strategy=broadcast)")


def num_shuffles(df: DataFrame) -> int:
    """Count shuffle exchanges (broadcast exchanges excluded — those move
    only the small side and are the cheap kind)."""
    return len(re.findall(r"Exchange (?:hash|range|SinglePartition|rebalance)", physical_plan(df)))


def final_plan(df: DataFrame) -> str:
    """The AQE-finalized physical plan. Triggers one execution of THIS
    DataFrame's own query execution (``collect`` — ``count()`` would build
    a separate execution and leave this plan unfinalized). Under AQE the
    pre-execution plan carries no codegen annotations and stage shapes can
    still change, so runtime properties (codegen spans, AQE broadcast
    conversions, coalesced partition counts) are only readable here."""
    df.collect()
    text = df._jdf.queryExecution().executedPlan().toString()
    return text.split("+- == Initial Plan ==")[0]


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans in the FINAL plan (executes the
    query once). Spark prints them as ``*(N)`` node prefixes."""
    return len(set(re.findall(r"\*\((\d+)\)", final_plan(df))))
