"""Join surface: every join type the delegated SQL can express
(reference operators.py:80 — PG executes them; here Catalyst does).

Scale notes (100 TB posture):
- Dimension tables (region/nation/customer/supplier/part) are explicitly
  ``F.broadcast``-hinted where small relative to the fact side, so the big
  fact table never shuffles for those joins.
- Fact⋈fact joins (orders⋈lineitem) are left to Catalyst's sort-merge with
  AQE skew handling — at 100 TB that is the right default, and bucketing
  both sides on the join key (operators/jdbc.py helper) removes the shuffle
  entirely for repeated joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import dec, t

# ---------------------------------------------------------------------------
# Inner equi-join. No broadcast hint: customer is fact-scale in TPC-H
# (~1/7 of lineitem's bytes), so a forced F.broadcast would override AQE's
# size threshold and OOM at 100 TB. AQE's runtime-stats conversion still
# broadcasts it when it is genuinely small (as at test SFs).
# ---------------------------------------------------------------------------

register(
    "join_orders_customer_inner",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
            "inner",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )
)


# ---------------------------------------------------------------------------
# Left outer: customers with zero orders keep a NULL side → n_orders = 0.
# ---------------------------------------------------------------------------

register(
    "join_left_outer",
    """
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    ORDER BY c.c_custkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "customer")
        .join(
            t(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )
)


# ---------------------------------------------------------------------------
# Right + full outer over nation⋈supplier (nations with no suppliers show
# the preserved side).
# ---------------------------------------------------------------------------

register(
    "join_right_outer",
    """
    SELECT n.n_name, COUNT(s.s_suppkey) AS n_suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "supplier")
        .join(
            t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "right",
        )
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
        .orderBy("n_name")
    )
)

register(
    "join_full_outer",
    """
    SELECT COALESCE(n.n_nationkey, s.s_nationkey) AS nationkey,
           COUNT(DISTINCT n.n_name) AS n_nations,
           COUNT(s.s_suppkey) AS n_suppliers
    FROM nation n FULL JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY COALESCE(n.n_nationkey, s.s_nationkey)
    ORDER BY nationkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "nation")
        .join(
            t(spark, sf_dir, "supplier"),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "full",
        )
        .groupBy(F.coalesce("n_nationkey", "s_nationkey").alias("nationkey"))
        .agg(
            F.countDistinct("n_name").alias("n_nations"),
            F.count("s_suppkey").alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )
)


# ---------------------------------------------------------------------------
# Semi / anti (EXISTS / NOT EXISTS). Catalyst plans these as left-semi /
# left-anti hash joins — no row duplication, no wide shuffle of the payload.
# ---------------------------------------------------------------------------

register(
    "join_semi",
    """
    SELECT c_custkey FROM customer c
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "customer")
        .join(
            t(spark, sf_dir, "orders"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .select("c_custkey")
        .orderBy("c_custkey")
    )
)

register(
    "join_anti",
    """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "customer")
        .join(
            t(spark, sf_dir, "orders"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey")
        .orderBy("c_custkey")
    )
)


# ---------------------------------------------------------------------------
# Cross join (tiny×tiny only — planned as broadcast nested loop).
# ---------------------------------------------------------------------------

register(
    "join_cross",
    """
    SELECT r.r_name, COUNT(*) AS n
    FROM region r CROSS JOIN nation n
    GROUP BY r.r_name ORDER BY r.r_name
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "region")
        .crossJoin(t(spark, sf_dir, "nation"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("r_name")
    )
)


# ---------------------------------------------------------------------------
# Theta (non-equi) join — broadcast nested loop on a tiny side.
# ---------------------------------------------------------------------------

register(
    "join_theta_nonequi",
    """
    SELECT r.r_regionkey, COUNT(*) AS n_higher_nations
    FROM region r JOIN nation n ON n.n_regionkey > r.r_regionkey
    GROUP BY r.r_regionkey ORDER BY r.r_regionkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "region")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("n_regionkey") > F.col("r_regionkey"),
            "inner",
        )
        .groupBy("r_regionkey")
        .agg(F.count(F.lit(1)).alias("n_higher_nations"))
        .orderBy("r_regionkey")
    )
)


# ---------------------------------------------------------------------------
# TPC-H Q3-style: 3-way join, filter both sides of the date, top-10 revenue.
# orders⋈lineitem is the fact⋈fact sort-merge; customer is broadcast.
# ---------------------------------------------------------------------------

register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp"))
        .join(
            t(spark, sf_dir, "orders").filter(
                F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "inner",
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
            "inner",
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )
)


# ---------------------------------------------------------------------------
# TPC-H Q5-style: 6-way join through the whole star, revenue per nation.
# Only the constant-size dims (nation 25 rows, region 5 rows) carry
# broadcast hints; customer and supplier grow with SF, so they are left to
# AQE — at test SFs AQE still broadcasts them from runtime stats, at 100 TB
# they become shuffle joins instead of executor OOMs.
# ---------------------------------------------------------------------------

register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('AMERICA', 'ASIA')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "lineitem")
        .join(
            t(spark, sf_dir, "orders").filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2000-01-01 00:00:00").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "inner",
        )
        .join(
            t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
            "inner",
        )
        .join(
            t(spark, sf_dir, "supplier"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
            "inner",
        )
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "inner",
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "region").filter(F.col("r_name").isin("AMERICA", "ASIA"))
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
            "inner",
        )
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )
)


# ---------------------------------------------------------------------------
# Self join (orders to orders of the same customer on consecutive keys is
# contrived; use part-to-part on same brand, counting same-brand pairs of
# different sizes — still an equi-join on a mid-cardinality key).
# ---------------------------------------------------------------------------

register(
    "join_self",
    """
    SELECT a.p_brand, COUNT(*) AS n_pairs
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    GROUP BY a.p_brand
    ORDER BY a.p_brand
    """,
)(
    lambda spark, sf_dir: _join_self(spark, sf_dir)
)


def _join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    a = part.select(F.col("p_brand"), F.col("p_partkey").alias("a_key"))
    b = part.select(F.col("p_brand").alias("b_brand"), F.col("p_partkey").alias("b_key"))
    return (
        a.join(b, (F.col("p_brand") == F.col("b_brand")) & (F.col("a_key") < F.col("b_key")))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Null-safe equi-join (<=> / IS NOT DISTINCT FROM — PG's null-safe
# comparison, part of the delegated surface). The fixture has no NULL keys,
# so both sides derive one: NULLIF(nationkey % 5, 0) — every 5th customer/
# supplier gets a NULL key, and the null-safe join matches NULL to NULL
# (the plain equi-join would drop those rows). Aggregated to pair counts
# per key so the NULL-bucket size is visible in the output.
# Scale note: <=> compiles to a regular hash-join key (null maps to one
# bucket) — a hot NULL key at 100 TB is a skew key like any other; salt it
# or pre-split the NULL partition if NULLs dominate.
# ---------------------------------------------------------------------------


def _join_null_safe(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("k"),
        F.col("c_custkey"),
    )
    s = t(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("k"),
        F.col("s_suppkey"),
    )
    return (
        c.join(s, c["k"].eqNullSafe(s["k"]))
        .groupBy(c["k"].alias("k"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.col("k").asc_nulls_first())
    )


register(
    "join_null_safe",
    """
    WITH c AS (SELECT NULLIF(c_nationkey % 5, 0) AS k, c_custkey FROM customer),
    s AS (SELECT NULLIF(s_nationkey % 5, 0) AS k, s_suppkey FROM supplier)
    SELECT c.k AS k, COUNT(*) AS n_pairs
    FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
    GROUP BY c.k ORDER BY k NULLS FIRST
    """,
)(_join_null_safe)
