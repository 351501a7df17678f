"""Core relational surface: scan → filter → project → aggregate → sort,
set operations, subqueries, grouping sets.

This is the spine of the delegated SQL surface the reference pushes to
PostgreSQL (reference operators.py:80 ``COPY (SELECT …) TO STDOUT``) —
served natively here by Spark SQL / Catalyst. Filters and projections are
expressed declaratively so Catalyst pushes them into the parquet scan
(verified via .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import dec, dsum, t

# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary.
# Scan (+pushdown filter) → hash-aggregate (partial+final, map-side combine
# is automatic) → sort. At 100 TB this stays a single shuffle on the two
# low-cardinality group keys; no skew risk (≤ ~6 groups).
# ---------------------------------------------------------------------------

Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


register("q1_pricing_summary", Q1_ORACLE)(pricing_summary)


# ---------------------------------------------------------------------------
# Projection + filter with expression pushdown (scan-level predicate).
# ---------------------------------------------------------------------------

register(
    "filter_project",
    """
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS double_price
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 50000
    ORDER BY o_orderkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 50000))
        .select(
            "o_orderkey",
            "o_custkey",
            (dec("o_totalprice") * 2).cast("double").alias("double_price"),
        )
        .orderBy("o_orderkey")
    )
)


# ---------------------------------------------------------------------------
# DISTINCT projection (shuffle on the distinct keys; at scale this is a
# partial-distinct + exchange + final-distinct, same shape as an agg).
# ---------------------------------------------------------------------------

register(
    "distinct_select",
    """
    SELECT DISTINCT o_orderstatus, o_orderpriority
    FROM orders ORDER BY o_orderstatus, o_orderpriority
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )
)


# ---------------------------------------------------------------------------
# COUNT(DISTINCT) + HAVING. Spark plans distinct-agg as a two-phase
# expand+agg; HAVING is just a post-agg filter.
# ---------------------------------------------------------------------------

register(
    "agg_distinct_having",
    """
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    HAVING COUNT(*) > 10
    ORDER BY c_mktsegment
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .filter(F.col("n_customers") > 10)
        .orderBy("c_mktsegment")
    )
)


# ---------------------------------------------------------------------------
# Conditional aggregation (FILTER (WHERE …) equivalent via when()).
# ---------------------------------------------------------------------------

register(
    "agg_filtered",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_price,
           COUNT(*) AS n_total
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_bulk"),
            F.sum(F.when(F.col("l_discount") > 0.05, dec("l_extendedprice")))
            .cast("double")
            .alias("discounted_price"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .orderBy("l_returnflag")
    )
)


# ---------------------------------------------------------------------------
# ROLLUP / CUBE (grouping sets — Catalyst's Expand operator; one shuffle).
# ---------------------------------------------------------------------------

register(
    "agg_rollup",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )
)

register(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )
)


# ---------------------------------------------------------------------------
# ORDER BY … LIMIT k — planned as TakeOrderedAndProject (no global sort:
# per-partition top-k then merge on the driver; scale-safe for small k).
# Ties broken by the unique key so the result is deterministic.
# ---------------------------------------------------------------------------

register(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )
)


# ---------------------------------------------------------------------------
# Set operations.
# ---------------------------------------------------------------------------

register(
    "set_union_all",
    """
    SELECT c_nationkey AS nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey FROM customer WHERE c_acctbal > 0
      UNION ALL
      SELECT s_nationkey FROM supplier
    ) u GROUP BY nationkey ORDER BY nationkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_nationkey").alias("nationkey"))
        .unionAll(t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey")
    )
)

register(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersect(t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )
)

register(
    "set_except",
    """
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("nationkey"))
        .exceptAll(
            t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
        )
        .distinct()
        .orderBy("nationkey")
    )
)


# ---------------------------------------------------------------------------
# Subqueries: scalar (uncorrelated), IN, correlated EXISTS.
# Catalyst decorrelates EXISTS into a left-semi join automatically.
# ---------------------------------------------------------------------------

register(
    "subquery_scalar",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
    ORDER BY o_orderkey
    """,
)(
    lambda spark, sf_dir: _subquery_scalar(spark, sf_dir)
)


def _subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airflow_postgres_csv_spark.catalog import load

    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
        ORDER BY o_orderkey
        """
    )


register(
    "subquery_in",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
    ORDER BY c_custkey
    """,
)(
    lambda spark, sf_dir: _subquery_in(spark, sf_dir)
)


def _subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airflow_postgres_csv_spark.catalog import load

    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        ORDER BY c_custkey
        """
    )


register(
    "subquery_exists_correlated",
    """
    SELECT c_custkey FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    )
    ORDER BY c_custkey
    """,
)(
    lambda spark, sf_dir: _subquery_exists(spark, sf_dir)
)


def _subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airflow_postgres_csv_spark.catalog import load

    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
        )
        ORDER BY c_custkey
        """
    )


# ---------------------------------------------------------------------------
# CTE (WITH) through the SQL path.
# ---------------------------------------------------------------------------

register(
    "cte_with",
    """
    WITH big AS (
      SELECT o_custkey, COUNT(*) AS n_big
      FROM orders WHERE o_totalprice > 50000 GROUP BY o_custkey
    )
    SELECT n_big, COUNT(*) AS n_customers
    FROM big GROUP BY n_big ORDER BY n_big
    """,
)(
    lambda spark, sf_dir: _cte_with(spark, sf_dir)
)


def _cte_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airflow_postgres_csv_spark.catalog import load

    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH big AS (
          SELECT o_custkey, COUNT(*) AS n_big
          FROM orders WHERE o_totalprice > 50000 GROUP BY o_custkey
        )
        SELECT n_big, COUNT(*) AS n_customers
        FROM big GROUP BY n_big ORDER BY n_big
        """
    )


# ---------------------------------------------------------------------------
# Approximate aggregates. Sketches differ across engines, so the check is a
# self-verifying invariant computed Spark-side: approx within 5% of exact →
# both engines return the same boolean/count row.
# ---------------------------------------------------------------------------

register(
    "approx_distinct_invariant",
    """
    SELECT COUNT(DISTINCT o_custkey) AS exact_nd, 1 AS approx_ok FROM orders
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "orders")
        .agg(
            F.countDistinct("o_custkey").alias("exact_nd"),
            F.approx_count_distinct("o_custkey", 0.01).alias("_approx"),
        )
        .select(
            "exact_nd",
            (
                (F.col("_approx") >= F.col("exact_nd") * 0.95)
                & (F.col("_approx") <= F.col("exact_nd") * 1.05)
            )
            .cast("int")
            .alias("approx_ok"),
        )
    )
)


# ---------------------------------------------------------------------------
# Deterministic hash sampling — the reproducible, engine-portable form of
# TABLESAMPLE (RNG-based sampling can't be replayed across engines, and at
# scale partition-dependent Bernoulli draws aren't stable either; an
# md5-prefix predicate is bit-identical everywhere and pushes down).
# ---------------------------------------------------------------------------

register(
    "scan_hash_sample",
    """
    SELECT o_orderkey, o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
    FROM orders
    WHERE md5(CAST(o_orderkey AS VARCHAR)) LIKE '0%'
    ORDER BY o_orderkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "orders")
        .filter(F.md5(F.col("o_orderkey").cast("string")).startswith("0"))
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("total"),
        )
        .orderBy("o_orderkey")
    )
)


# ---------------------------------------------------------------------------
# Approximate percentile (t-digest style sketch) sanity-gated against the
# exact percentile: |approx - exact| / exact must stay under 5%. The flag
# pattern keeps the query oracle-checkable even though the sketch itself
# is engine-specific.
# ---------------------------------------------------------------------------

register(
    "approx_percentile_accuracy",
    "SELECT 3 AS n_checked, 1 AS within_tolerance",
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "lineitem")
        .agg(
            *[
                F.percentile_approx("l_extendedprice", p, 1000).alias(f"a{i}")
                for i, p in enumerate((0.25, 0.5, 0.95))
            ],
            *[
                F.expr(f"percentile(l_extendedprice, {p})").alias(f"e{i}")
                for i, p in enumerate((0.25, 0.5, 0.95))
            ],
        )
        .select(
            F.lit(3).alias("n_checked"),
            F.when(
                (F.abs(F.col("a0") - F.col("e0")) / F.col("e0") < 0.05)
                & (F.abs(F.col("a1") - F.col("e1")) / F.col("e1") < 0.05)
                & (F.abs(F.col("a2") - F.col("e2")) / F.col("e2") < 0.05),
                1,
            )
            .otherwise(0)
            .alias("within_tolerance"),
        )
    )
)


# ---------------------------------------------------------------------------
# Multiset set-ops: INTERSECT ALL / EXCEPT ALL keep duplicate cardinality
# (min(a,b) and a-b occurrences respectively) — distinct plan shape from
# the DISTINCT variants above (no dedup aggregate over the union).
# ---------------------------------------------------------------------------

register(
    "set_intersect_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersectAll(
            t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
        )
        .orderBy("nationkey")
    )
)

register(
    "set_except_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .exceptAll(
            t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
        )
        .orderBy("nationkey")
    )
)
