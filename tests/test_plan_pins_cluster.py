"""Plan-shape pins for the k-means and KS-drift queries.

At 100 TB the properties that matter:

- k-means ASSIGNMENT must stay a broadcast of the k×d centroid matrix
  with zero shuffle of the point side (the arg-min is a per-row JVM
  array expression); the only shuffle in an iteration is the k·d-row
  centroid-update aggregate.
- the KS window must run over the COMPRESSED VALUE DOMAIN (post
  hash-agg), never over raw document rows, and the documents scan must
  prune to the two columns the statistic needs.
"""

from __future__ import annotations

import os

import pytest

from airflow_postgres_csv_spark.plans import introspect as I
from airflow_postgres_csv_spark.queries import queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def kmeans_df(spark):
    return queries()["cluster_kmeans_lloyd"](spark, SF_DIR)


def test_kmeans_assignment_is_broadcast_and_agg_shuffles_only(spark):
    from airflow_postgres_csv_spark.queries.cluster_queries import _assign, _GRID

    from pyspark.sql import functions as F

    pts = (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .select("vec_id", "label", F.expr(_GRID).alias("xd"))
    )
    cents = [r["xd"] for r in pts.filter(F.col("vec_id") < 8).collect()]
    a = _assign(pts, spark, cents)
    plan = I.physical_plan(a)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    # the point side is never shuffled for assignment
    assert I.num_shuffles(a) == 0, plan


def test_kmeans_full_query_shuffle_budget(kmeans_df):
    # final assignment + output sort: one range-partition exchange for the
    # orderBy and the broadcast exchange — no per-point hash shuffle.
    assert I.num_shuffles(kmeans_df) <= 1, I.physical_plan(kmeans_df)


def test_ks_scan_prunes_to_two_columns(spark):
    df = queries()["stats_ks_by_source"](spark, SF_DIR)
    schemas = I.read_schema(df)
    doc_scan = [s for s in schemas if "source" in s]
    assert doc_scan, schemas
    for s in doc_scan:
        assert "text" not in s, s  # the wide column never leaves the files


def test_hybrid_rrf_legs_truncate_before_rank_windows(spark):
    """Both retrieval legs must plan their depth-50 cut as
    TakeOrderedAndProject (per-partition partial top-k) so the
    unpartitioned rank windows only ever see <=50 survivor rows; the
    query-vector and BM25-stats sides must broadcast."""
    df = queries()["search_hybrid_rrf"](spark, SF_DIR)
    plan = I.physical_plan(df)
    assert plan.count("TakeOrderedAndProject") >= 2, plan
    rows = df.collect()
    assert 0 < len(rows) <= 20
    # fused scores strictly ordered by (rrf desc, doc_id) with correct rank
    for i, r in enumerate(rows, start=1):
        assert r["rk"] == i
        assert r["r_lex"] is not None or r["r_sem"] is not None
    rrfs = [r["rrf"] for r in rows]
    assert rrfs == sorted(rrfs, reverse=True)
