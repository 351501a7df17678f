"""with_global_order_stats must match the single-partition window exactly.

The distributed bucket-offset scheme (operators/global_order.py) is only
correct if global rank / NTILE / running sums are bit-identical to what an
unpartitioned ``Window.orderBy`` computes — including NTILE's uneven
tile-size rule and heavy duplicate runs that straddle bucket boundaries.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.global_order import with_global_order_stats


def _reference(df, value, desc, tiebreak, n):
    o = [F.col(value).desc() if desc else F.col(value).asc(), F.col(tiebreak)]
    w = W.orderBy(*o)
    return df.select(
        tiebreak,
        F.row_number().over(w).alias("rnk"),
        F.ntile(n).over(w).alias("tile"),
        F.sum(value).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("cs"),
    )


@pytest.mark.parametrize("n_rows,n_tiles,desc", [(997, 4, True), (64, 5, False), (3, 4, True)])
def test_matches_unpartitioned_window(spark, n_rows, n_tiles, desc):
    rng = random.Random(n_rows)
    # Values drawn from a small domain => long duplicate runs that must not
    # be split across buckets; n_rows=3 exercises the N < n tile branch.
    rows = [(i, rng.randrange(0, 17)) for i in range(n_rows)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = with_global_order_stats(
        df, "v", descending=desc, tiebreak="k",
        rank_col="rnk", ntile=n_tiles, cumsum={"cs": F.col("v")},
    ).select("k", "rnk", "tile", "cs")
    want = _reference(df, "v", desc, "k", n_tiles)
    assert sorted(got.collect()) == sorted(want.collect())


def test_constant_value_column(spark):
    # All-equal values: every row lands in bucket 0; ordering is pure
    # tiebreak. Degenerates to one task, like any total duplicate run.
    df = spark.createDataFrame([(i, 7) for i in range(50)], "k long, v long")
    got = with_global_order_stats(
        df, "v", descending=True, tiebreak="k", rank_col="rnk", ntile=4
    )
    rows = {r["k"]: (r["rnk"], r["tile"]) for r in got.collect()}
    assert rows[0] == (1, 1) and rows[49] == (50, 4)


def test_empty_input(spark):
    df = spark.createDataFrame([], "k long, v double")
    got = with_global_order_stats(df, "v", descending=True, tiebreak="k", rank_col="rnk")
    assert got.count() == 0


def test_no_unpartitioned_window_in_plan(spark):
    import re

    df = spark.createDataFrame([(i, float(i % 13)) for i in range(100)], "k long, v double")
    out = with_global_order_stats(df, "v", descending=True, tiebreak="k", rank_col="rnk")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"windowspecdefinition\(\w+#\d+L? (?:ASC|DESC)", plan)
