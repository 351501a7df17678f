"""Plan-shape pins for the late-round-6 corpus additions: shuffle budgets
and broadcast requirements that keep these queries at their intended
100 TB shape. A regression past any pin means an extra corpus-wide
shuffle (or a sort-merge join of a side that must broadcast) appeared —
exactly the class of silent change the budget exists to catch.
"""

from __future__ import annotations

from airflow_postgres_csv_spark.plans import introspect as I
from airflow_postgres_csv_spark.queries import registry

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = registry()[name].fn(spark, SF)
    return df, I.physical_plan(df)


def test_exact_substring_spans_budget(spark):
    """Digest agg + join-back + doc window + island agg: ≤4 shuffles; the
    dup-gram side joins broadcast (its size is O(duplicated grams), tiny
    relative to the corpus); never a sort-merge join or cartesian."""
    df, plan = _plan(spark, "dedup_exact_substring_spans")
    assert I.num_shuffles(df) <= 4, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan


def test_source_kl_divergence_budget(spark):
    """One (source, token) aggregation feeds three consumers through a
    localCheckpoint; vocabulary and totals join BROADCAST onto it: ≤4
    shuffles, no sort-merge join, no Python."""
    df, plan = _plan(spark, "text_source_kl_divergence")
    assert I.num_shuffles(df) <= 4, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_scalar_pipeline_budgets(spark):
    """Pure aggregation/window pipelines: char entropy, CUSUM, ACF ≤3
    shuffles; readability ≤2 — and all JVM-side (no Python eval)."""
    for name, budget in (
        ("text_char_entropy", 3),
        ("events_cusum_changepoint", 3),
        ("events_autocorrelation", 3),
        ("text_readability", 2),
    ):
        df, plan = _plan(spark, name)
        assert I.num_shuffles(df) <= budget, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)
