"""Window-function surface: ranking, offsets, frames (ROWS / RANGE),
ntile, first/last — the full set the delegated SQL could use
(reference operators.py:80; PG window functions → Spark Window API).

Determinism: every ORDER BY inside a window includes a unique key as the
final tiebreak, so ranks/offsets are reproducible across engines.

Scale: a window = one shuffle on partitionBy keys + per-partition sort.
Partition keys here are customer-level (high cardinality, low skew). An
unpartitioned window would serialize onto one task — never used here.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.global_order import with_global_order_stats
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import dec, t

# ---------------------------------------------------------------------------
# row_number / rank / dense_rank — top-3 orders per customer.
# ---------------------------------------------------------------------------

register(
    "window_topk_per_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "orders")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("o_custkey").orderBy(
                    F.col("o_totalprice").desc(), F.col("o_orderkey")
                )
            ),
        )
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )
)

register(
    "window_rank_dense",
    """
    SELECT c_nationkey, c_custkey,
           RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drnk
    FROM customer
    ORDER BY c_nationkey, rnk, c_custkey
    """,
)(
    lambda spark, sf_dir: _rank_dense(spark, sf_dir)
)


def _rank_dense(spark, sf_dir):
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        t(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .orderBy("c_nationkey", "rnk", "c_custkey")
    )


# ---------------------------------------------------------------------------
# lag / lead offsets along each customer's order history.
# ---------------------------------------------------------------------------

register(
    "window_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           LAG(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
           LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)(
    lambda spark, sf_dir: _lag_lead(spark, sf_dir)
)


def _lag_lead(spark, sf_dir):
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# ROWS frame: running revenue per customer (exact-decimal running sum).
# ---------------------------------------------------------------------------

register(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)(
    lambda spark, sf_dir: _running_sum(spark, sf_dir)
)


def _running_sum(spark, sf_dir):
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# RANGE frame keyed on a numeric column: sum of order values within
# ±1000 order keys of the current one, per customer.
# ---------------------------------------------------------------------------

register(
    "window_range_frame",
    """
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING
           ) AS n_near
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)(
    lambda spark, sf_dir: _range_frame(spark, sf_dir)
)


def _range_frame(spark, sf_dir):
    w = W.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-1000, 1000)
    return (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", F.count(F.lit(1)).over(w).alias("n_near"))
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# ntile + first/last value with explicit frames.
# ---------------------------------------------------------------------------

register(
    "window_ntile_first_last",
    """
    SELECT c_custkey,
           NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile,
           FIRST_VALUE(c_custkey) OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS richest_in_nation,
           LAST_VALUE(c_custkey) OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS poorest_in_nation
    FROM customer
    ORDER BY c_custkey
    """,
)(
    lambda spark, sf_dir: _ntile_first_last(spark, sf_dir)
)


def _ntile_first_last(spark, sf_dir):
    """Global NTILE(4) without a single-partition window.

    ``ntile`` over an unpartitioned ``Window.orderBy`` serializes the whole
    table onto one task; ``with_global_order_stats`` reconstructs the exact
    same quartiles with partitioned shuffles only (bucket-by-value, local
    row_number, broadcast bucket offsets — see operators/global_order.py).
    """
    wn = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    frame = wn.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        with_global_order_stats(
            t(spark, sf_dir, "customer"),
            "c_acctbal",
            descending=True,
            tiebreak="c_custkey",
            ntile=4,
            ntile_col="quartile",
        )
        .select(
            "c_custkey",
            "quartile",
            F.first("c_custkey").over(frame).alias("richest_in_nation"),
            F.last("c_custkey").over(frame).alias("poorest_in_nation"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Aggregate-over-window without frame (whole-partition stats) + ratio.
# ---------------------------------------------------------------------------

register(
    "window_share_of_group",
    """
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) /
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS DOUBLE)
             AS share_of_customer
    FROM orders
    ORDER BY o_orderkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            (
                dec("o_totalprice").cast("double")
                / F.sum(dec("o_totalprice")).over(W.partitionBy("o_custkey")).cast("double")
            ).alias("share_of_customer"),
        )
        .orderBy("o_orderkey")
    )
)


# ---------------------------------------------------------------------------
# Distribution window functions: percent_rank / cume_dist over the customer
# balance within each nation. Both are rank-arithmetic (no value sums), so
# cross-engine determinism needs only a total order — ties broken by key.
# ---------------------------------------------------------------------------

register(
    "window_percent_cume",
    """
    SELECT c_custkey, c_nationkey,
           ROUND(percent_rank() OVER w, 9) AS bal_pct_rank,
           ROUND(cume_dist() OVER w, 9) AS bal_cume_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(
                F.percent_rank().over(
                    W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
                ),
                9,
            ).alias("bal_pct_rank"),
            F.round(
                F.cume_dist().over(
                    W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
                ),
                9,
            ).alias("bal_cume_dist"),
        )
        .orderBy("c_custkey")
    )
)


# ---------------------------------------------------------------------------
# nth_value + IGNORE NULLS navigation — the remaining window-function
# vocabulary (first/last/nth with null skipping, the "latest non-null
# observation per entity" shape). Values pass through unmodified (no
# arithmetic), so doubles compare exactly.
# ---------------------------------------------------------------------------


def _window_nth_ignore_nulls(spark, sf_dir):
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    v = F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
    return (
        t(spark, sf_dir, "orders")
        .withColumn("v", v)
        .select(
            "o_orderkey",
            "o_custkey",
            F.nth_value("o_totalprice", 2).over(w).alias("second_total"),
            F.first("v", ignorenulls=True).over(w).alias("first_f_total"),
            F.last("v", ignorenulls=True).over(w).alias("last_f_total"),
        )
        .orderBy("o_orderkey")
    )


register(
    "window_nth_ignore_nulls",
    """
    SELECT o_orderkey, o_custkey,
           nth_value(o_totalprice, 2) OVER w AS second_total,
           first_value(v IGNORE NULLS) OVER w AS first_f_total,
           last_value(v IGNORE NULLS) OVER w AS last_f_total
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS v
      FROM orders
    )
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderkey
    """,
)(_window_nth_ignore_nulls)
