"""Advanced SQL surface: grouping sets, lateral joins, recursive CTEs.

These run through the SQL path (``spark.sql`` over registered views) —
the exact shape a user of the reference would push through the ``sql``
parameter (reference operators.py:80 delegates any PostgreSQL SELECT;
Spark 4 serves all three natively, recursive CTEs included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from airflow_postgres_csv_spark.catalog import register_views
from airflow_postgres_csv_spark.queries import register


def _sql(spark: SparkSession, sf_dir: str, q: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(q)


# ---------------------------------------------------------------------------
# GROUPING SETS with grouping_id disambiguation (cube/rollup's general
# form). One shuffle; Spark expands the sets in the Expand operator, so
# input rows are replicated per set — fine for low-cardinality keys.
# ---------------------------------------------------------------------------

_GROUPING_SETS = """
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
       {gid} AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY gid, o_orderstatus, o_orderpriority
"""

register(
    "agg_grouping_sets",
    _GROUPING_SETS.format(gid="GROUPING_ID(o_orderstatus, o_orderpriority)"),
)(
    lambda spark, sf_dir: _sql(
        spark,
        sf_dir,
        _GROUPING_SETS.format(gid="GROUPING_ID(o_orderstatus, o_orderpriority)"),
    )
)


# ---------------------------------------------------------------------------
# Correlated LATERAL subquery: each region's top-2 nations by name — the
# per-row dependent subquery shape (Catalyst plans it as a LateralJoin;
# DuckDB runs the same SQL).
# ---------------------------------------------------------------------------

_LATERAL = """
SELECT r.r_name, t.n_name, t.n_nationkey
FROM region r,
     LATERAL (
       SELECT n_name, n_nationkey
       FROM nation n
       WHERE n.n_regionkey = r.r_regionkey
       ORDER BY n_name
       LIMIT 2
     ) t
ORDER BY r.r_name, t.n_name
"""

register("join_lateral_topn", _LATERAL)(
    lambda spark, sf_dir: _sql(spark, sf_dir, _LATERAL)
)


# ---------------------------------------------------------------------------
# Recursive CTE: a generated month spine left-joined to per-month order
# counts (months with no orders kept — the shape a coverage/backfill
# report needs). Spark 4 executes WITH RECURSIVE natively (iterative
# union under the hood); DuckDB runs the identical SQL.
# ---------------------------------------------------------------------------

_RECURSIVE = """
WITH RECURSIVE months(m) AS (
  SELECT CAST('1992-01-01' AS DATE)
  UNION ALL
  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
  WHERE m < CAST('1998-12-01' AS DATE)
),
per_month AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
  FROM orders
  GROUP BY 1
)
SELECT CAST(months.m AS STRING) AS month,
       COALESCE(per_month.n_orders, 0) AS n_orders,
       COALESCE(per_month.total, 0.0) AS total
FROM months LEFT JOIN per_month ON months.m = per_month.m
ORDER BY months.m
"""

register("recursive_month_spine", _RECURSIVE)(
    lambda spark, sf_dir: _sql(spark, sf_dir, _RECURSIVE)
)


# ---------------------------------------------------------------------------
# The reference's literal input surface is a SQL *string* (operators.py:80
# pushes the user's text to the database). Everything above expresses plans
# via the DataFrame API; this query runs raw SQL text through spark.sql()
# over registered views — CTE + join + window + aggregate in one string —
# proving the string surface end-to-end (same Catalyst plan either way).
# ---------------------------------------------------------------------------

_RAW_SQL = """
    WITH seg AS (
        SELECT c_custkey, c_mktsegment FROM {customer}
    ),
    rev AS (
        SELECT o.o_custkey, CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM {orders} o GROUP BY o.o_custkey
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(spend AS DECIMAL(18,4))) AS DOUBLE) AS segment_spend,
           RANK() OVER (ORDER BY SUM(CAST(spend AS DECIMAL(18,4))) DESC) AS spend_rank
    FROM seg JOIN rev ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY spend_rank, c_mktsegment
"""


def sql_string_surface(spark, sf_dir):
    from airflow_postgres_csv_spark.catalog import load

    load(spark, sf_dir, "customer").createOrReplaceTempView("_v_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_v_orders")
    return spark.sql(_RAW_SQL.format(customer="_v_customer", orders="_v_orders"))


register(
    "sql_string_surface",
    _RAW_SQL.format(customer="customer", orders="orders"),
)(sql_string_surface)


# ---------------------------------------------------------------------------
# arg-max/arg-min aggregates (PG: DISTINCT ON / lateral order-by-limit;
# Spark: max_by/min_by; DuckDB: arg_max/arg_min). Ordering keys are packed
# into one BIGINT (cents * 2^40 + event_id) so ties in `value` are broken
# by the unique event_id identically in both engines — bare max_by on a
# tied key is nondeterministic in ANY engine.
# Scale: a plain hash-agg with partial aggregation; no window, no sort.
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from airflow_postgres_csv_spark.queries._helpers import t as _t  # noqa: E402


def _agg_max_by_min_by(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        (F.round(F.col("value") * 100).cast("long") * F.lit(1 << 40)
         + F.col("event_id")).alias("k"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.max_by("event_id", "k").alias("max_value_event"),
            F.min_by("event_id", "k").alias("min_value_event"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


register(
    "agg_max_by_min_by",
    """
    WITH ev AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) * 1099511627776 + event_id AS k
      FROM events
    )
    SELECT event_type,
           arg_max(event_id, k) AS max_value_event,
           arg_min(event_id, k) AS min_value_event,
           COUNT(*) AS n
    FROM ev GROUP BY event_type ORDER BY event_type
    """,
)(_agg_max_by_min_by)


# ---------------------------------------------------------------------------
# Inverse-distribution aggregates, discrete flavor: percentile_disc picks
# an EXISTING value (smallest with cume_dist >= p) — so unlike
# percentile_cont there is no interpolation arithmetic and the 2-decimal
# fixture doubles hash bit-identically across engines by construction.
# ---------------------------------------------------------------------------


def _percentile_disc_groups(spark, sf_dir):
    return spark.sql(
        """
        SELECT event_type,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY value) AS p50,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95
        FROM {ev} GROUP BY event_type ORDER BY event_type
        """,
        ev=_t(spark, sf_dir, "events"),
    )


register(
    "percentile_disc_groups",
    """
    SELECT event_type,
           quantile_disc(value, 0.25) AS p25,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.95) AS p95
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)(_percentile_disc_groups)
