"""Plan-shape pins for the session-6c operators (BFS, entity resolution,
A/B readout, seasonal-naive backtest): no cartesian products, no Python
in batch plans, bounded shuffles."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.plans import introspect as I
from airflow_postgres_csv_spark.queries import registry

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = registry()[name].fn(spark, SF)
    return df, I.physical_plan(df)


def test_er_candidate_join_budget(spark):
    """Candidate generation is blocking EQUI-joins only — no cartesian
    product anywhere, nothing leaves the JVM, and the whole verify stage
    (union of two blocked self-joins + levenshtein) stays within a fixed
    shuffle budget however big the record table is."""
    from airflow_postgres_csv_spark.operators.resolution import (
        blocked_candidate_pairs,
    )
    from airflow_postgres_csv_spark.queries._helpers import t

    pairs = blocked_candidate_pairs(
        t(spark, SF, "customer"),
        "c_custkey",
        "c_name",
        [
            F.substring("c_name", 1, 16),
            F.concat(
                F.col("c_nationkey").cast("string"),
                F.lit(":"),
                F.expr("right(c_name, 2)"),
            ),
        ],
    )
    plan = I.physical_plan(pairs)
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert I.num_shuffles(pairs) <= 6, plan


def test_ab_ttest_two_shuffles_no_python(spark):
    """Hash assignment is a pure projection: the entire readout is the
    per-user agg shuffle plus the 1-row final agg — nothing else."""
    df, plan = _plan(spark, "events_ab_ttest")
    assert "BatchEvalPython" not in plan, plan
    assert I.num_shuffles(df) <= 2, plan


def test_seasonal_naive_budget(spark):
    """One fact shuffle builds the hourly series (shared by actual +
    shifted-forecast branches via the checkpoint); the join and final agg
    stay within budget, JVM-side throughout."""
    df, plan = _plan(spark, "rollup_seasonal_naive")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert I.num_shuffles(df) <= 4, plan


def test_bfs_edge_build_and_expansion_shape(spark):
    """The BFS expansion joins must broadcast the frontier (the big edge
    table never reshuffles per round): pin the shape of one expansion
    round on a concrete graph."""
    from airflow_postgres_csv_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(50)] + [(i, i + 7) for i in range(40)],
        "u bigint, v bigint",
    )
    e_sym = (
        e.unionByName(e.selectExpr("v as u", "u as v"))
        .where("u <> v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = spark.createDataFrame([(0,)], "node bigint")
    one_round = e_sym.join(
        F.broadcast(frontier.selectExpr("node as u")), "u"
    ).selectExpr("v as node").distinct()
    plan = I.physical_plan(one_round)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # end-to-end result shape stays correct under the pinned plan
    out = bfs_hops(e, frontier, max_hops=3)
    assert out.count() > 0
    assert out.where("hop > 3").count() == 0
