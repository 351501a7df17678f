"""Plan-shape pins for the four most expensive headline queries (round-4
verdict task #7): the graph trio's shuffle budget and the live-streaming
session query's state-store partition count. A per-round Exchange-count
creep or an unscoped state partition count would silently multiply their
cost — pin the current shape the way join_bucketed_colocated is pinned.

The pins are per-ROUND budgets: each graph algorithm runs a fixed number
of rounds at test scale, and each round contributes a bounded number of
Exchanges (joins + aggs on the edge/rank tables). The assertions bound
the TOTAL Exchange count in the physical plan, so either a per-round
regression (an extra shuffle inside the loop) or a round-count regression
(convergence loop running longer at fixed scale) trips them.
"""

from __future__ import annotations

from airflow_postgres_csv_spark.plans import introspect as I
from airflow_postgres_csv_spark.queries import registry

SF = "/root/testdata/sf0.001"

def _shuffles(spark, name: str) -> int:
    df = registry()[name].fn(spark, SF)
    return I.num_shuffles(df)


# Measured at SF in round 5: triangle 6, pagerank 1, kcore 2. The rank/core
# loops localCheckpoint each round, so the visible plan is the post-loop
# tail — a regression that stops checkpointing (unbounded lineage) or adds
# shuffles to the tail trips these immediately.


def test_graph_triangle_shuffle_budget(spark):
    assert _shuffles(spark, "graph_triangle_count") <= 8


def test_graph_pagerank_shuffle_budget(spark):
    assert _shuffles(spark, "graph_pagerank") <= 3


def test_graph_kcore_shuffle_budget(spark):
    assert _shuffles(spark, "graph_kcore") <= 4


def test_streaming_session_state_partitions_scoped(spark):
    """_run scopes spark.sql.shuffle.partitions to 8 for the state store's
    lifetime (per-partition open/commit fixed cost dominates these
    single-fixture micro-batches) and restores the session default after.
    Read the actual state-operator partition count from the completed
    stream's final progress."""
    from airflow_postgres_csv_spark.queries import streaming_live as SL

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    out = registry()["streaming_session_live"].fn(spark, SF)
    assert out.count() >= 0
    # session default restored
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    prog = SL._LAST_PROGRESS[0]
    assert prog is not None
    ops = prog["stateOperators"]
    assert ops, prog
    assert all(op["numShufflePartitions"] == 8 for op in ops), ops
    # staged temp dirs were cleaned up after the run
    assert SL._STAGED_DIRS == []
