"""Invariants of the distributed Lloyd's k-means (cluster_queries.py).

The differential oracle already pins the exact trajectory; these pin the
*algorithmic* guarantees that must hold for any input:

- assignment optimality: every point's assigned distance is <= its
  distance to every other centroid (arg-min correctness of the JVM
  array expression);
- determinism: two independent runs produce identical assignments
  (no RNG, no partition-order dependence).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.queries.cluster_queries import _GRID, _K, _assign

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def pts(spark):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .select("vec_id", "label", F.expr(_GRID).alias("xd"))
    )


def _centroids(pts):
    return [r["xd"] for r in pts.filter(F.col("vec_id") < _K).orderBy("vec_id").collect()]


def test_assignment_is_argmin_over_all_centroids(spark, pts):
    cents = _centroids(pts)
    a = _assign(pts, spark, cents).select(
        "vec_id", F.col("best.cid").alias("cid"), F.col("best.d2").alias("d2"), "xd"
    )
    # recompute the full distance vector per row and assert the assigned
    # one is the minimum (ties impossible: arg-min picks lowest cid)
    rows = a.collect()
    for r in rows:
        dists = [
            sum((x - c) * (x - c) for x, c in zip(r["xd"], cv)) for cv in cents
        ]
        assert r["d2"] == pytest.approx(min(dists), abs=0.0)
        assert dists[r["cid"]] == min(dists)


def test_kmeans_runs_are_deterministic(spark):
    from airflow_postgres_csv_spark.queries import queries

    fn = queries()["cluster_kmeans_lloyd"]
    a = [(r["vec_id"], r["cid"], r["d2r"]) for r in fn(spark, SF_DIR).collect()]
    b = [(r["vec_id"], r["cid"], r["d2r"]) for r in fn(spark, SF_DIR).collect()]
    assert a == b
    assert len({cid for _, cid, _ in a}) > 1  # a real partition, not one blob
