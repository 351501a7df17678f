"""TPC-H-style query depth beyond q1/q3/q5, adapted to the fixture schema.

The reference delegates this whole surface to Postgres (reference
operators.py:80 ``COPY (SELECT ...) TO STDOUT``); here each canonical
TPC-H shape is expressed with the DataFrame API so Catalyst plans it.
Fixture deltas from real TPC-H (FIXTURES.md): no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode, so q4/q12/q21's commit-vs-receipt
predicates are re-based on ``l_shipdate > o_orderdate`` (late shipment),
which exercises the identical plan shape (exists-semi-join / conditional
aggregation).

Scale notes (100 TB posture), per query:
- q6: pure scan+filter+agg — predicate pushdown to parquet, no shuffle
  beyond the final single-row reduce.
- q4: semi join lineitem→orders on orderkey; Catalyst plans a shuffled
  semi-join; at scale both sides hash-partition on orderkey once.
- q9/q10: star joins — nation (25 rows) and supplier/customer dims
  broadcast under AQE's threshold; only lineitem⋈orders shuffles.
- q18: self-aggregated lineitem reused for the HAVING filter, then
  semi-joined back — one shuffle on orderkey serves both the groupBy and
  the join (exchange reuse).
- q22: anti join customer→orders; the scalar avg is a one-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from airflow_postgres_csv_spark.operators.global_order import with_global_order_stats
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import dec, dsum, t

# ---------------------------------------------------------------------------
# q6 — forecasting revenue change: tight scan-level predicates, one agg row.
# ---------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec("l_extendedprice") * dec("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)(q6_forecast_revenue)


# ---------------------------------------------------------------------------
# q4 — order priority checking: EXISTS semi-join (late-shipment variant).
# ---------------------------------------------------------------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    window = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = window.join(
        l,
        (window.o_orderkey == l.l_orderkey) & (l.l_shipdate > window.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)(q4_order_priority)


# ---------------------------------------------------------------------------
# q9 — product-type profit by nation and year (partsupp-less variant):
# supplier nation x order year revenue over PROMO-class parts.
# ---------------------------------------------------------------------------


def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    amount = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


register(
    "q9_nation_profit",
    """
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)(q9_nation_profit)


# ---------------------------------------------------------------------------
# q10 — returned-item reporting: top-20 customers by lost revenue.
# ---------------------------------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, c_acctbal, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)(q10_returned_items)


# ---------------------------------------------------------------------------
# q14 — promotion effect: conditional aggregation over a part join.
# Both engines build the identical exact-decimal sums, then do one double
# division — bit-identical across engines and partitionings.
# ---------------------------------------------------------------------------


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


register(
    "q14_promo_effect",
    """
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)(q14_promo_effect)


# ---------------------------------------------------------------------------
# q18 — large-volume customers: aggregate-then-semi-join on the same key.
# ---------------------------------------------------------------------------

_Q18_QTY = 120


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    per_order = l.groupBy("l_orderkey").agg(dsum("l_quantity", "total_qty"))
    big = per_order.filter(F.col("total_qty") > _Q18_QTY)
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            dec("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


register(
    "q18_large_volume",
    f"""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_QTY}
    )
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
           total_qty
    FROM orders
    JOIN big      ON o_orderkey = big.l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)(q18_large_volume)


# ---------------------------------------------------------------------------
# q22 — global sales opportunity: scalar-subquery threshold + anti join,
# grouped by market segment (fixture has no phone column). "Idle" means no
# order since 2000-01-01 — an unrestricted anti join is empty at every SF
# because nearly every customer has some order.
# ---------------------------------------------------------------------------


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    pos = c.filter(F.col("c_acctbal") > 0)
    threshold = pos.agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("thr")
    )
    rich = c.join(F.broadcast(threshold)).filter(F.col("c_acctbal") > F.col("thr"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


register(
    "q22_idle_customers",
    """
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)(q22_idle_customers)


# ---------------------------------------------------------------------------
# Pareto revenue concentration: suppliers ranked by exact-decimal revenue
# with running cumulative totals — the 80/20 concentration curve. All
# outputs are decimal-exact sums and integer ranks (no float threshold
# filters whose boundary could flip between engines).
# ---------------------------------------------------------------------------


def supplier_pareto(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    rev = l.groupBy("l_suppkey").agg(
        F.sum(
            dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec("l_discount"))
        ).alias("revenue")
    )
    # Global rank + running revenue over supplier-cardinality aggregates via
    # the distributed bucket-offset scheme (operators/global_order.py) — an
    # unpartitioned window here would serialize every supplier to one task.
    return (
        with_global_order_stats(
            rev,
            "revenue",
            descending=True,
            tiebreak="l_suppkey",
            rank_col="rnk",
            cumsum={"cum_revenue": F.col("revenue")},
        )
        .select(
            "l_suppkey",
            F.col("revenue").cast("double").alias("revenue"),
            "rnk",
            F.col("cum_revenue").cast("double").alias("cum_revenue"),
        )
        .orderBy("rnk")
    )


register(
    "supplier_pareto",
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
               AS revenue
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey,
           CAST(revenue AS DOUBLE) AS revenue,
           row_number() OVER (ORDER BY revenue DESC, l_suppkey) AS rnk,
           CAST(SUM(revenue) OVER (ORDER BY revenue DESC, l_suppkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_revenue
    FROM rev
    ORDER BY rnk
    """,
)(supplier_pareto)


# ---------------------------------------------------------------------------
# Calendar seasonality matrix: order counts + exact-decimal revenue by
# (month, ISO weekday). o_orderdate is a DATE — calendar extraction on
# DATEs is timezone-free, so no UTC pinning is needed here.
# ---------------------------------------------------------------------------

register(
    "orders_seasonality_matrix",
    """
    SELECT EXTRACT(month FROM o_orderdate) AS mo,
           isodow(o_orderdate) AS dow,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.month("o_orderdate").cast("long").alias("mo"),
            (F.weekday("o_orderdate") + 1).cast("long").alias("dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("mo", "dow")
    )
)


# ---------------------------------------------------------------------------
# Supplier delivery-lag stats: days from order date to each lineitem's
# ship date, per supplier — integer day lags (DATE subtraction), exact
# integer moments, exact integer median (percentile over BIGINT
# interpolates at worst to .5 — engine-stable).
# ---------------------------------------------------------------------------

register(
    "supplier_delivery_lag",
    """
    WITH lag AS (
      SELECT l_suppkey,
             date_diff('day', o_orderdate, CAST(l_shipdate AS DATE)) AS d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT l_suppkey,
           COUNT(*) AS n,
           CAST(SUM(d) AS BIGINT) AS sum_days,
           MIN(d) AS min_days,
           MAX(d) AS max_days,
           CAST(median(CAST(d AS BIGINT)) AS DOUBLE) AS med_days
    FROM lag GROUP BY l_suppkey ORDER BY l_suppkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "lineitem")
        .join(
            t(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_suppkey",
            F.datediff(F.to_date("l_shipdate"), F.col("o_orderdate"))
            .cast("long")
            .alias("d"),
        )
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("d").alias("sum_days"),
            F.min("d").alias("min_days"),
            F.max("d").alias("max_days"),
            F.median(F.col("d").cast("bigint")).cast("double").alias("med_days"),
        )
        .orderBy("l_suppkey")
    )
)
