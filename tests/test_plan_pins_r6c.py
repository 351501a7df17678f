"""Plan-shape pins for the session-6b operators (semantic dedup, DSIR,
expectations gate): shuffle budgets, mandatory broadcasts, and no-Python
/ no-cartesian guards that keep each at its intended 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.plans import introspect as I
from airflow_postgres_csv_spark.queries import registry

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = registry()[name].fn(spark, SF)
    return df, I.physical_plan(df)


def test_semantic_dedup_budget(spark):
    """Cell assignment is a pure projection (JVM folds, no Python, no
    shuffle of its own); the candidate join is an equi-join on the cell
    key and the dropped-id set joins back broadcast: no cartesian
    product, no Python eval, bounded shuffles."""
    df, plan = _plan(spark, "dedup_semantic_semdedup")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert I.num_shuffles(df) <= 5, plan


def test_dsir_budget(spark):
    """Bucket stats (O(buckets) rows) and the 1-row totals must BROADCAST
    onto the token stream — a sort-merge join here shuffles the whole
    corpus twice. One explode, one stats agg, one per-doc agg, one
    top-k: bounded shuffles, no Python."""
    df, plan = _plan(spark, "sample_dsir_importance")
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert I.num_shuffles(df) <= 5, plan


def test_expectations_gate_is_one_projection(spark):
    """The routing filter + flag columns compile into the scan-side
    projection of the write job: no shuffle, no Python, and the
    violation counters ride a CollectMetrics (observe) node instead of a
    second aggregation job."""
    from airflow_postgres_csv_spark.operators.expectations import (
        Expectation,
        snapshot_write_with_expectations,
    )
    import tempfile

    df = spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "id long, v long"
    )
    captured = {}
    import airflow_postgres_csv_spark.operators.snapshots as S

    real_commit = S.snapshot_commit

    def spy(frame, root, **kw):
        captured.setdefault("plans", []).append(
            frame._jdf.queryExecution().executedPlan().toString()
        )
        return real_commit(frame, root, **kw)

    S.snapshot_commit = spy
    try:
        with tempfile.TemporaryDirectory() as tmp:
            snapshot_write_with_expectations(
                df,
                f"{tmp}/t",
                [
                    Expectation("pos", "v > 0", "warn"),
                    Expectation("small", "v < 4", "drop"),
                    Expectation("even", "v % 2 = 0", "quarantine"),
                ],
                quarantine_root=f"{tmp}/q",
            )
    finally:
        S.snapshot_commit = real_commit
    for plan in captured["plans"]:
        assert "Exchange" not in plan, plan          # routing never shuffles
        assert "BatchEvalPython" not in plan, plan   # and never leaves the JVM
    assert any("CollectMetrics" in p for p in captured["plans"])
