"""Analytics surface: histograms, interval-sweep concurrency, URL parsing.

Three operator families a warehouse user of the reference would push into
the delegated-SQL surface (SURVEY.md §2.2 "delegated SQL" — the reference
runs arbitrary SELECTs server-side, `operators.py:80`), each with a shape
that matters at 100 TB:

- ``hist_width_bucket``: fixed-bound bucketing is a map-only projection +
  one hash-agg shuffle keyed on ~12 buckets — constant output, no skew.
  DuckDB has no ``width_bucket``, so the oracle replays the bucket
  arithmetic explicitly — an independent check of Spark's implementation.
- ``orders_max_inflight``: the classic interval-overlap ("how many open
  at once") sweep. The naive form is a range join (rows × days); the
  sweep form pre-aggregates +1/-1 deltas **per day first**, so the
  global running sum orders only O(distinct days) rows — a window over a
  few thousand rows regardless of fact-table size. Pre-aggregation also
  makes the running sum deterministic (no intra-day tie ordering).
- ``text_url_parse``: `parse_url` host/path/query extraction. URLs are
  synthesized deterministically from fixture columns (the corpus has no
  URL column); the oracle rebuilds the same components with plain string
  concatenation, independently checking Spark's URI parser.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.global_order import with_global_order_stats
from airflow_postgres_csv_spark.operators.sketches import heavy_hitters
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import t

# ---------------------------------------------------------------------------
# Histogram via width_bucket: events.value over [0, 500) in 10 buckets,
# bucket 0 = underflow, bucket 11 = overflow. Oracle replays the bucket
# function as arithmetic (DuckDB has no width_bucket). Bucket edges are
# exact doubles (multiples of 50), so floor() agrees bit-for-bit.
# ---------------------------------------------------------------------------

register(
    "hist_width_bucket",
    """
    SELECT CAST(CASE WHEN value < 0 THEN 0
                     WHEN value >= 500 THEN 11
                     ELSE FLOOR(value / 50.0) + 1 END AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "events")
        .select(
            F.width_bucket("value", F.lit(0.0), F.lit(500.0), F.lit(10)).alias(
                "bucket"
            ),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("bucket")
    )
)


# ---------------------------------------------------------------------------
# Interval sweep: an order is "in flight" from its order date until its
# last lineitem ships. Per-month max of the daily in-flight count.
#
# Shape: per-order close date (one agg), per-day +1/-1 deltas (one agg on
# ~O(days) groups), ONE global running sum over distinct days only, then a
# per-month max. The single-partition window is over date cardinality
# (~2.4k rows for 7 years), not fact rows — safe at any fact scale.
# ---------------------------------------------------------------------------


def _orders_max_inflight(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    close = lineitem.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("close_d")
    )
    spans = orders.join(
        close, orders.o_orderkey == close.l_orderkey, "inner"
    ).select(F.to_date("o_orderdate").alias("open_d"), "close_d")
    deltas = (
        spans.select(F.col("open_d").alias("d"), F.lit(1).alias("delta"))
        .unionAll(
            spans.select(
                F.date_add("close_d", 1).alias("d"), F.lit(-1).alias("delta")
            )
        )
        .groupBy("d")
        .agg(F.sum("delta").alias("net"))
    )
    daily = deltas.select(
        "d",
        F.sum("net")
        .over(W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("in_flight"),
    )
    return (
        daily.groupBy(F.date_format("d", "yyyy-MM").alias("month"))
        .agg(F.max("in_flight").alias("max_in_flight"))
        .orderBy("month")
    )


register(
    "orders_max_inflight",
    """
    WITH close AS (
      SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_d
      FROM lineitem GROUP BY 1
    ),
    spans AS (
      SELECT CAST(o_orderdate AS DATE) AS open_d, close_d
      FROM orders JOIN close ON o_orderkey = l_orderkey
    ),
    deltas AS (
      SELECT d, SUM(delta) AS net FROM (
        SELECT open_d AS d, 1 AS delta FROM spans
        UNION ALL
        SELECT close_d + INTERVAL 1 DAY, -1 FROM spans
      ) GROUP BY 1
    ),
    daily AS (
      SELECT d, SUM(net) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS in_flight
      FROM deltas
    )
    SELECT strftime(d, '%Y-%m') AS month,
           CAST(MAX(in_flight) AS BIGINT) AS max_in_flight
    FROM daily
    GROUP BY 1
    ORDER BY 1
    """,
)(_orders_max_inflight)


# ---------------------------------------------------------------------------
# parse_url surface: synthesize a deterministic URL per document, extract
# HOST / PATH / QUERY and a single query parameter, aggregate per host.
# Oracle rebuilds each component from the same source columns with string
# concatenation — it never parses, so Spark's URI parser is checked
# against an independent construction.
# ---------------------------------------------------------------------------


def _text_url_parse(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id"),
        F.lit("?q="),
        F.col("n_chars"),
    )
    parsed = docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("q")).cast("long").alias("q_param"),
    )
    return (
        parsed.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("q_param").alias("total_q"),
            F.count_distinct(F.substring_index("path", "/", 2)).alias("n_langs"),
        )
        .orderBy("host")
    )


register(
    "text_url_parse",
    """
    SELECT source || '.example.com' AS host,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_q,
           COUNT(DISTINCT '/' || lang) AS n_langs
    FROM documents
    GROUP BY 1
    ORDER BY 1
    """,
)(_text_url_parse)


# ---------------------------------------------------------------------------
# Equi-DEPTH histogram (equal row count per bucket) of order totals: the
# complement of hist_width_bucket's fixed bounds, and the optimizer-
# statistics shape (quantile bins) every planner keeps. Bucket assignment
# is exact NTILE(8) over (o_totalprice, o_orderkey) — computed distributed
# by operators/global_order.py (bucket-offset scheme, no single-partition
# window); per-bucket bounds and exact-decimal sums come from one hash-agg
# over 8 groups. Oracle replays it with a plain NTILE window.
# ---------------------------------------------------------------------------

register(
    "hist_equi_depth",
    """
    WITH b AS (
      SELECT o_orderkey, o_totalprice,
             NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)(
    lambda spark, sf_dir: (
        with_global_order_stats(
            t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
            "o_totalprice",
            descending=False,
            tiebreak="o_orderkey",
            ntile=8,
            ntile_col="bucket",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("bucket")
    )
)


# ---------------------------------------------------------------------------
# Frequent-items (heavy hitters): users contributing > 0.8% of all events,
# via per-partition Misra-Gries candidate summaries + one exact candidate-
# restricted count (operators/sketches.py — candidate recall is guaranteed
# by the MG error bound, so the output equals the plain GROUP BY/HAVING
# oracle exactly while the only shuffle is the candidate-set aggregation).
# ---------------------------------------------------------------------------

register(
    "events_heavy_hitters",
    """
    SELECT user_id AS item, COUNT(*) AS freq
    FROM events GROUP BY user_id
    HAVING COUNT(*) > (SELECT COUNT(*) FROM events) * 0.008
    ORDER BY item
    """,
)(
    lambda spark, sf_dir: (
        heavy_hitters(t(spark, sf_dir, "events"), "user_id", 0.008).orderBy("item")
    )
)


# ---------------------------------------------------------------------------
# Count-min sketch (operators/sketches.py cms_sketch/cms_estimate): the
# d×w counter matrix is a RELATION, built by one map-side-combinable
# aggregation and point-queried by a broadcast equi-join + min(). Bucket
# hashing is md5-based, so the oracle replays the ENTIRE sketch in SQL and
# the estimates compare exactly — alongside the two analytic guarantees
# (est >= exact; est <= exact + n/width witnessed here) surfaced as flags.
# ---------------------------------------------------------------------------

register(
    "count_min_sketch_freq",
    """
    WITH cells AS (
      SELECT d.r AS depth_row,
             CAST(('0x' || substring(md5(d.r || ':' || event_type), 1, 8))::BIGINT % 256
                  AS INT) AS bucket
      FROM events, (SELECT unnest(['0','1','2','3']) AS r) d
    ),
    sketch AS (
      SELECT depth_row, bucket, COUNT(*) AS cnt FROM cells GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT event_type FROM events),
    probes AS (
      SELECT k.event_type, d.r AS depth_row,
             CAST(('0x' || substring(md5(d.r || ':' || k.event_type), 1, 8))::BIGINT % 256
                  AS INT) AS bucket
      FROM keys k, (SELECT unnest(['0','1','2','3']) AS r) d
    ),
    est AS (
      SELECT p.event_type, MIN(COALESCE(s.cnt, 0)) AS est
      FROM probes p LEFT JOIN sketch s USING (depth_row, bucket)
      GROUP BY 1
    ),
    exact AS (SELECT event_type, COUNT(*) AS exact_cnt FROM events GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_total FROM events)
    SELECT e.event_type, x.exact_cnt, e.est,
           CAST(e.est >= x.exact_cnt AS INT) AS never_under,
           CAST(e.est <= x.exact_cnt + CAST(CEIL(n.n_total / 256.0) AS BIGINT) AS INT)
             AS within_bound
    FROM est e JOIN exact x USING (event_type) CROSS JOIN n
    ORDER BY e.event_type
    """,
)(
    lambda spark, sf_dir: _count_min_sketch_freq(spark, sf_dir)
)


def _count_min_sketch_freq(spark, sf_dir):
    from airflow_postgres_csv_spark.operators.sketches import cms_estimate, cms_sketch

    ev = t(spark, sf_dir, "events")
    sketch = cms_sketch(ev, "event_type", depth=4, width=256)
    keys = ev.select("event_type").distinct()
    est = cms_estimate(sketch, keys, "event_type", depth=4, width=256)
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_cnt"))
    n = ev.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        est.join(exact, "event_type")
        .crossJoin(F.broadcast(n))  # 1-row total: broadcast is exact-size-safe
        .select(
            "event_type",
            "exact_cnt",
            "est",
            (F.col("est") >= F.col("exact_cnt")).cast("int").alias("never_under"),
            (
                F.col("est")
                <= F.col("exact_cnt") + F.ceil(F.col("n_total") / 256.0).cast("long")
            )
            .cast("int")
            .alias("within_bound"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Triangle counting over the part co-occurrence graph (parts bought
# together in one order — the "bought-with" graph every recommender
# pipeline builds). Spark side is the degree-oriented O(m^1.5) algorithm
# in operators/graph.py:triangle_counts — orientation bounds hub-node
# wedge explosion, the difference between O(d²) and O(m) work on a
# power-law hub. The oracle enumerates each triangle a<b<c once via the
# canonical three-way self-join — an independent formulation, same count.
# ---------------------------------------------------------------------------


def _graph_triangle_count(spark, sf_dir):
    from airflow_postgres_csv_spark.operators.graph import triangle_counts

    op = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    edges = (
        op.alias("x")
        .join(op.alias("y"), "o")
        .where(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .distinct()
    )
    return triangle_counts(edges).orderBy("node")


register(
    "graph_triangle_count",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    e AS (
      SELECT DISTINCT x.p AS u, y.p AS v
      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
    ),
    tri AS (
      SELECT ab.u AS x, ab.v AS y, bc.v AS z
      FROM e ab
      JOIN e bc ON ab.v = bc.u
      JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
    )
    SELECT node, COUNT(*) AS n_triangles
    FROM (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    GROUP BY node ORDER BY node
    """,
)(_graph_triangle_count)


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto front) of orders: maximize o_totalprice, minimize
# o_orderdate ("the biggest early orders"). An order is on the front iff
# no other order strictly dominates it. Spark side is the two-phase
# distributed skyline (divide-and-conquer: local fronts per hash bucket
# with a *partitioned* window sweep, then one refine pass over the union
# of local fronts — a set that is tiny because each local front is already
# Pareto-minimal). The oracle is the independent NOT EXISTS dominance
# formulation.
# ---------------------------------------------------------------------------


def _skyline_orders(spark, sf_dir):
    from airflow_postgres_csv_spark.operators.skyline import skyline_max_min

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("_x"),
        F.unix_timestamp("o_orderdate").alias("_y"),
    )
    return (
        skyline_max_min(o, "_x", "_y", tiebreak="o_orderkey")
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("o_totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy("o_orderkey")
    )


register(
    "skyline_orders",
    """
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM orders q
    WHERE NOT EXISTS (
      SELECT 1 FROM orders p
      WHERE (p.o_totalprice >= q.o_totalprice AND p.o_orderdate <= q.o_orderdate)
        AND (p.o_totalprice > q.o_totalprice OR p.o_orderdate < q.o_orderdate)
    )
    ORDER BY o_orderkey
    """,
)(_skyline_orders)


# ---------------------------------------------------------------------------
# Referential-integrity audit across the star schema — the dbt-style test
# battery (FK orphans, duplicate PKs, NULL keys) as one constant-size
# relation. operators/integrity.py keeps every check a lazy aggregate-only
# plan (orphans fold the anti-join into a conditional count — the bad rows
# are never materialized), so the full audit is a handful of one-row jobs
# at any corpus size. The oracle replays each check with independent SQL.
# ---------------------------------------------------------------------------


def _dataset_integrity_audit(spark, sf_dir):
    from airflow_postgres_csv_spark.operators import integrity as IG

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    checks = {
        "orders_custkey_fk": IG.fk_orphans(orders, "o_custkey", cust, "c_custkey"),
        "lineitem_orderkey_fk": IG.fk_orphans(li, "l_orderkey", orders, "o_orderkey"),
        "lineitem_partkey_fk": IG.fk_orphans(li, "l_partkey", part, "p_partkey"),
        "lineitem_suppkey_fk": IG.fk_orphans(li, "l_suppkey", supp, "s_suppkey"),
        "customer_nationkey_fk": IG.fk_orphans(cust, "c_nationkey", nation, "n_nationkey"),
        "orders_pk_unique": IG.dup_pk_count(orders, ["o_orderkey"]),
        "lineitem_pk_unique": IG.dup_pk_count(li, ["l_orderkey", "l_linenumber"]),
        "customer_pk_unique": IG.dup_pk_count(cust, ["c_custkey"]),
        "orders_custkey_notnull": IG.null_key_count(orders, "o_custkey"),
    }
    return IG.audit_checks(checks).orderBy("check_name")


register(
    "dataset_integrity_audit",
    """
    WITH checks AS (
      SELECT 'orders_custkey_fk' AS check_name,
             (SELECT COUNT(*) FROM orders o
              WHERE o.o_custkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_bad,
             (SELECT COUNT(*) FROM orders) AS n_total
      UNION ALL
      SELECT 'lineitem_orderkey_fk',
             (SELECT COUNT(*) FROM lineitem l
              WHERE l.l_orderkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
             (SELECT COUNT(*) FROM lineitem)
      UNION ALL
      SELECT 'lineitem_partkey_fk',
             (SELECT COUNT(*) FROM lineitem l
              WHERE l.l_partkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
             (SELECT COUNT(*) FROM lineitem)
      UNION ALL
      SELECT 'lineitem_suppkey_fk',
             (SELECT COUNT(*) FROM lineitem l
              WHERE l.l_suppkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
             (SELECT COUNT(*) FROM lineitem)
      UNION ALL
      SELECT 'customer_nationkey_fk',
             (SELECT COUNT(*) FROM customer c
              WHERE c.c_nationkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
             (SELECT COUNT(*) FROM customer)
      UNION ALL
      SELECT 'orders_pk_unique',
             (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders),
             (SELECT COUNT(*) FROM orders)
      UNION ALL
      SELECT 'lineitem_pk_unique',
             (SELECT COUNT(*) FROM lineitem)
               - (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)),
             (SELECT COUNT(*) FROM lineitem)
      UNION ALL
      SELECT 'customer_pk_unique',
             (SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer),
             (SELECT COUNT(*) FROM customer)
      UNION ALL
      SELECT 'orders_custkey_notnull',
             (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL),
             (SELECT COUNT(*) FROM orders)
    )
    SELECT check_name, CAST(n_bad AS BIGINT) AS n_bad,
           CAST(n_total AS BIGINT) AS n_total,
           CAST(n_bad = 0 AS INT) AS ok
    FROM checks ORDER BY check_name
    """,
)(_dataset_integrity_audit)


# ---------------------------------------------------------------------------
# Median absolute deviation per group — the robust dispersion statistic
# outlier-tolerant quality monitoring uses where stddev is skew-fragile.
# Two grouped exact percentiles with a broadcast median join between them
# (group medians are a |groups|-row table). Both engines interpolate the
# same way on the same 2-decimal doubles; outputs rounded to 6 dp like the
# percentile_cont query.
# ---------------------------------------------------------------------------


def _stats_mad_by_group(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .select("event_type", "med", F.abs(F.col("value") - F.col("med")).alias("dev"))
        .groupBy("event_type")
        .agg(
            F.round(F.first("med"), 6).alias("median_value"),
            F.round(F.expr("percentile(dev, 0.5)"), 6).alias("mad"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


register(
    "stats_mad_by_group",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(ANY_VALUE(m.med), 6) AS median_value,
           ROUND(quantile_cont(ABS(e.value - m.med), 0.5), 6) AS mad,
           COUNT(*) AS n
    FROM events e JOIN med m USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)(_stats_mad_by_group)


# ---------------------------------------------------------------------------
# Exact integer PageRank over the part co-occurrence graph (parts ordered
# together = an undirected edge, fed symmetrically). Six rounds of
# r' = scale/8 + (7·Σ (r div outdeg)) div 8 — all integer arithmetic, so
# both engines produce bit-identical BIGINT ranks regardless of summation
# order (operators/graph.py:pagerank_integer). The oracle unrolls the same
# six stages as chained CTEs; the stage SQL is generated, not hand-typed,
# so Spark and oracle share one parameterization.
# ---------------------------------------------------------------------------

_PR_ITERS = 6
_PR_SCALE = 1 << 30


def _graph_pagerank(spark, sf_dir):
    from airflow_postgres_csv_spark.operators.graph import pagerank_integer

    op = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e0 = (
        op.alias("x")
        .join(op.alias("y"), "o")
        .where(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .distinct()
    )
    sym = e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return pagerank_integer(sym, iters=_PR_ITERS, scale=_PR_SCALE).orderBy("node")


def _pagerank_oracle_sql(iters: int, scale: int) -> str:
    base = scale // 8
    stages = [f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes)"]
    for i in range(1, iters + 1):
        stages.append(
            f"""r{i} AS (
      SELECT n.node, CAST({base} + (7 * COALESCE(c.s, 0)) // 8 AS BIGINT) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.v AS node, SUM(r.r // e.outdeg) AS s
        FROM de e JOIN r{i - 1} r ON r.node = e.u
        GROUP BY e.v
      ) c ON c.node = n.node
    )"""
        )
    return f"""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e0 AS (
      SELECT DISTINCT x.p AS u, y.p AS v
      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
    ),
    sym AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    deg AS (SELECT u, COUNT(*) AS outdeg FROM sym GROUP BY u),
    de AS (SELECT s.u, s.v, d.outdeg FROM sym s JOIN deg d USING (u)),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    {",".join(stages)}
    SELECT node, r AS rank_scaled FROM r{iters} ORDER BY node
    """


register("graph_pagerank", _pagerank_oracle_sql(_PR_ITERS, _PR_SCALE))(_graph_pagerank)


# ---------------------------------------------------------------------------
# Linear regression aggregates (regr_slope / regr_intercept parity) with
# EXACT moments: value (as integer cents) regressed on hours-since-anchor
# per event_type. Float regr_* aggregates are summation-order-dependent
# and can't be hash-compared across engines; instead all four moments
# (n, Σx, Σy, Σxy, Σx²) are exact 128-bit integer sums, the
# numerator/denominator are exact products, and slope/intercept are a
# fixed IEEE expression tree over them — bit-identical in both engines.
# Scale: one hash-agg with partial aggregation; no window, no shuffle
# beyond the 5-key groupBy.
# ---------------------------------------------------------------------------


def _stats_linreg_exact(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        # integer epoch anchor (2024-01-01T00:00Z): unix_timestamp of a
        # STRING literal parses in the session timezone and would shift x
        # under a non-UTC driver session
        F.floor(
            (F.unix_timestamp("ts") - F.lit(1704067200)) / 3600
        ).cast("decimal(38,0)").alias("x"),
        F.round(F.col("value") * 100).cast("decimal(38,0)").alias("y"),
    )
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("sx").cast("long").alias("sum_x_hours"),
        F.col("sy").cast("long").alias("sum_y_cents"),
        slope.alias("slope_cents_per_hour"),
        intercept.alias("intercept_cents"),
    ).orderBy("event_type")


register(
    "stats_linreg_exact",
    """
    WITH ev AS (
      SELECT event_type,
             CAST(FLOOR((epoch(ts) - epoch(TIMESTAMP '2024-01-01 00:00:00')) / 3600) AS HUGEINT) AS x,
             CAST(round(value * 100) AS HUGEINT) AS y
      FROM events
    ),
    agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM ev GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(sx AS BIGINT) AS sum_x_hours,
           CAST(sy AS BIGINT) AS sum_y_cents,
           CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
             AS slope_cents_per_hour,
           (CAST(sy AS DOUBLE)
             - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
               * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
             AS intercept_cents
    FROM agg ORDER BY event_type
    """,
)(_stats_linreg_exact)


# ---------------------------------------------------------------------------
# k-core decomposition (R-round peel) over the part co-occurrence graph —
# operators/graph.py:kcore_nodes. The oracle unrolls the same R peeling
# rounds as generated CTEs (the pagerank pattern): n_i = nodes of degree
# >= k in e_{i-1}; e_i = edges with both endpoints in n_i.
# ---------------------------------------------------------------------------

_KCORE_K = 4
_KCORE_ROUNDS = 6


def _graph_kcore(spark, sf_dir):
    from airflow_postgres_csv_spark.operators.graph import kcore_nodes

    op = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e0 = (
        op.alias("x")
        .join(op.alias("y"), "o")
        .where(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .distinct()
    )
    return kcore_nodes(e0, k=_KCORE_K, rounds=_KCORE_ROUNDS).orderBy("node")


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    # every e_i is referenced twice downstream (n_{i+1} and e_{i+1});
    # without MATERIALIZED DuckDB inlines the chain and re-evaluates the
    # base self-join 2^rounds times (measured: 147 s vs 1 s at sf0.01)
    stages = []
    for i in range(1, rounds + 1):
        prev = "sym" if i == 1 else f"e{i - 1}"
        stages.append(
            f"""n{i} AS MATERIALIZED (
      SELECT u FROM {prev} GROUP BY u HAVING COUNT(*) >= {k}
    ),
    e{i} AS MATERIALIZED (
      SELECT e.u, e.v FROM {prev} e
      JOIN n{i} a ON a.u = e.u
      JOIN n{i} b ON b.u = e.v
    )"""
        )
    return f"""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e0 AS (
      SELECT DISTINCT x.p AS u, y.p AS v
      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
    ),
    sym AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    {",".join(stages)}
    SELECT u AS node, COUNT(*) AS deg FROM e{rounds} GROUP BY u ORDER BY node
    """


register("graph_kcore", _kcore_oracle_sql(_KCORE_K, _KCORE_ROUNDS))(_graph_kcore)


# ---------------------------------------------------------------------------
# Winsorized mean per group — the outlier-clipping normalization quality
# pipelines apply before averaging heavy-tailed metrics. Cutoffs are
# exact grouped percentiles rounded to 6 dp BEFORE use (the established
# percentile-parity contract), broadcast-joined back; the mean is
# reassembled from an exact-decimal interior sum plus n_low·p05 +
# n_high·p95 — no double is ever accumulated, and the final expression
# is one fixed IEEE tree in both engines.
# ---------------------------------------------------------------------------


def _stats_winsorized_mean(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cuts = orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.05)"), 6).alias("p05"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 6).alias("p95"),
    )
    j = orders.join(F.broadcast(cuts), "o_orderstatus")
    interior = F.when(
        (F.col("o_totalprice") >= F.col("p05"))
        & (F.col("o_totalprice") <= F.col("p95")),
        F.col("o_totalprice").cast("decimal(18,2)"),
    ).otherwise(F.lit(0).cast("decimal(18,2)"))
    agg = j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("p05").alias("p05"),
        F.min("p95").alias("p95"),
        F.sum(F.when(F.col("o_totalprice") < F.col("p05"), 1).otherwise(0)).alias(
            "n_low"
        ),
        F.sum(F.when(F.col("o_totalprice") > F.col("p95"), 1).otherwise(0)).alias(
            "n_high"
        ),
        F.sum(interior).alias("interior_dec"),
    )
    w_mean = (
        F.col("interior_dec").cast("double")
        + F.col("n_low") * F.col("p05")
        + F.col("n_high") * F.col("p95")
    ) / F.col("n")
    return agg.select(
        "o_orderstatus",
        "n",
        "p05",
        "p95",
        "n_low",
        "n_high",
        w_mean.alias("w_mean"),
    ).orderBy("o_orderstatus")


register(
    "stats_winsorized_mean",
    """
    WITH cuts AS (
      SELECT o_orderstatus,
             ROUND(quantile_cont(o_totalprice, 0.05), 6) AS p05,
             ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95
      FROM orders GROUP BY o_orderstatus
    ),
    agg AS (
      SELECT o.o_orderstatus,
             COUNT(*) AS n,
             MIN(c.p05) AS p05,
             MIN(c.p95) AS p95,
             CAST(SUM(CASE WHEN o.o_totalprice < c.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
             CAST(SUM(CASE WHEN o.o_totalprice > c.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
             SUM(CASE WHEN o.o_totalprice >= c.p05 AND o.o_totalprice <= c.p95
                      THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS interior_dec
      FROM orders o JOIN cuts c USING (o_orderstatus)
      GROUP BY o.o_orderstatus
    )
    SELECT o_orderstatus, n, p05, p95, n_low, n_high,
           (CAST(interior_dec AS DOUBLE) + n_low * p05 + n_high * p95) / n AS w_mean
    FROM agg ORDER BY o_orderstatus
    """,
)(_stats_winsorized_mean)


# ---------------------------------------------------------------------------
# Distributed WEIGHTED median: smallest value whose cumulative weight
# reaches half the total (lower weighted median, integer rule
# 2·cumw >= W — no interpolation, so the answer is an actual data row
# and every comparison is integer-exact). Runs on the global-order
# machinery (value-range bucketing + partitioned local windows +
# broadcast offsets) — the cumulative weight over a TOTAL order without
# ever sorting in one partition. Weighted quantiles are how token-budget
# cuts pick thresholds ("the length cutoff containing half the corpus
# tokens") at 100 TB.
# ---------------------------------------------------------------------------


def _stats_weighted_median(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("key"),
    )
    g = with_global_order_stats(
        li, "v", descending=False, tiebreak="key", cumsum={"cumw": F.col("w")}
    )
    wtot = li.agg(F.sum("w").alias("w_total"))
    return (
        g.crossJoin(F.broadcast(wtot))
        .filter(2 * F.col("cumw") >= F.col("w_total"))
        .orderBy("v", "key")
        .limit(1)
        .select(
            "w_total",
            F.col("v").alias("median_value"),
            F.col("key").alias("at_key"),
            F.col("cumw").alias("cum_weight_at"),
        )
    )


register(
    "stats_weighted_median",
    """
    WITH o AS (
      SELECT l_extendedprice AS v,
             CAST(l_quantity AS BIGINT) AS w,
             l_orderkey * 10 + l_linenumber AS key,
             SUM(CAST(l_quantity AS BIGINT))
               OVER (ORDER BY l_extendedprice, l_orderkey * 10 + l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             SUM(CAST(l_quantity AS BIGINT)) OVER () AS w_total
      FROM lineitem
    )
    SELECT CAST(w_total AS BIGINT) AS w_total, v AS median_value, key AS at_key,
           CAST(cumw AS BIGINT) AS cum_weight_at
    FROM o WHERE 2 * cumw >= w_total
    ORDER BY v, key LIMIT 1
    """,
)(_stats_weighted_median)


# ---------------------------------------------------------------------------
# ABC (Pareto-class) inventory classification: parts ranked by exact-
# decimal revenue, classed A/B/C at 80%/95% cumulative share. The class
# boundaries are EXACT DECIMAL comparisons (cum·5 ≤ total·4, cum·20 ≤
# total·19) so no float threshold can flip between engines, and the
# running totals come from the distributed global-order machinery.
# ---------------------------------------------------------------------------


def _parts_abc_classes(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    rev = l.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("revenue")
    )
    g = with_global_order_stats(
        rev,
        "revenue",
        descending=True,
        tiebreak="l_partkey",
        rank_col="rnk",
        cumsum={"cum": F.col("revenue")},
    )
    total = rev.agg(F.sum("revenue").alias("tot"))
    cls = (
        F.when(F.col("cum") * 5 <= F.col("tot") * 4, F.lit("A"))
        .when(F.col("cum") * 20 <= F.col("tot") * 19, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        g.crossJoin(F.broadcast(total))
        .withColumn("abc", cls)
        .groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("revenue").cast("double").alias("class_revenue"),
            F.min("rnk").alias("first_rank"),
            F.max("rnk").alias("last_rank"),
        )
        .orderBy("abc")
    )


register(
    "parts_abc_classes",
    """
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
               AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, revenue,
             row_number() OVER (ORDER BY revenue DESC, l_partkey) AS rnk,
             SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(revenue) OVER () AS tot
      FROM rev
    )
    SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                WHEN cum * 20 <= tot * 19 THEN 'B'
                ELSE 'C' END AS abc,
           COUNT(*) AS n_parts,
           CAST(SUM(revenue) AS DOUBLE) AS class_revenue,
           MIN(rnk) AS first_rank,
           MAX(rnk) AS last_rank
    FROM ranked GROUP BY 1 ORDER BY 1
    """,
)(_parts_abc_classes)


# ---------------------------------------------------------------------------
# Supply-concentration HHI per part: Herfindahl–Hirschman index of each
# part's quantity share across suppliers, scaled to [0, 10000]. Exact
# integer moments (Σq, Σ per-supplier q²) with ONE final IEEE division —
# no per-supplier float share is ever summed.
# ---------------------------------------------------------------------------


def _parts_supply_hhi(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q")
    )
    agg = per_supp.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("q").alias("q_total"),
        F.sum(F.col("q") * F.col("q")).alias("q_sq"),
    )
    return (
        agg.select(
            "l_partkey",
            "n_suppliers",
            "q_total",
            (
                (F.col("q_sq") * 10000).cast("double")
                / (F.col("q_total") * F.col("q_total"))
            ).alias("hhi"),
        )
        .orderBy("l_partkey")
    )


register(
    "parts_supply_hhi",
    """
    WITH per_supp AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS q
      FROM lineitem GROUP BY 1, 2
    )
    SELECT l_partkey,
           COUNT(*) AS n_suppliers,
           CAST(SUM(q) AS BIGINT) AS q_total,
           CAST(SUM(q * q) * 10000 AS DOUBLE) / (SUM(q) * SUM(q)) AS hhi
    FROM per_supp GROUP BY l_partkey ORDER BY l_partkey
    """,
)(_parts_supply_hhi)


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue — the inequality metric over the
# whole customer base, computed DISTRIBUTED: the classic rank formula
# G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) needs a global ascending rank,
# which comes from the global-order machinery (never a single-partition
# sort); Σ rank·x and Σx are exact decimal/integer sums and the final
# value is ONE IEEE division of exact operands.
# ---------------------------------------------------------------------------


def _customers_gini_revenue(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x")
    )
    g = with_global_order_stats(
        rev, "x", descending=False, tiebreak="o_custkey", rank_col="rnk"
    )
    agg = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("rnk") * F.col("x")).alias("srx"),
    )
    num = 2 * F.col("srx") - (F.col("n") + 1) * F.col("sx")
    den = F.col("n") * F.col("sx")
    return agg.select(
        "n",
        F.col("sx").cast("double").alias("total_revenue"),
        (num.cast("double") / den.cast("double")).alias("gini"),
    )


register(
    "customers_gini_revenue",
    """
    WITH rev AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS rnk FROM rev
    )
    SELECT COUNT(*) AS n,
           CAST(SUM(x) AS DOUBLE) AS total_revenue,
           CAST(2 * SUM(rnk * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE)
             / CAST(COUNT(*) * SUM(x) AS DOUBLE) AS gini
    FROM ranked
    """,
)(_customers_gini_revenue)


# ---------------------------------------------------------------------------
# BFS hop distance over the bipartite order↔part purchase graph (orders at
# even node ids, parts at odd): every node within 4 undirected hops of the
# lowest-keyed order, with its exact BFS level — "collaborative-filtering
# distance" from a seed. Spark side is operators/graph.py:bfs_hops (one
# broadcast frontier equi-join + anti-join per level, O(1) plan via
# localCheckpoint); the oracle is an independent hop-bounded recursive-CTE
# closure with MIN(hop) per node. Levels alternate: orders at even hops,
# parts at odd — a structure the differential check verifies for free.
# ---------------------------------------------------------------------------

_BFS_HOPS = 4


def _graph_bfs_hops(spark, sf_dir):
    from airflow_postgres_csv_spark.operators.graph import bfs_hops

    li = t(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_orderkey") * 2).alias("u"),
        (F.col("l_partkey") * 2 + 1).alias("v"),
    ).distinct()
    sources = li.agg((F.min("l_orderkey") * 2).alias("node"))
    return bfs_hops(edges, sources, max_hops=_BFS_HOPS).orderBy("node")


register(
    "graph_bfs_hops",
    f"""
    WITH RECURSIVE eb AS (
      SELECT DISTINCT l_orderkey * 2 AS u, l_partkey * 2 + 1 AS v
      FROM lineitem
    ),
    e AS (SELECT u, v FROM eb UNION ALL SELECT v AS u, u AS v FROM eb),
    walk(node, hop) AS (
      SELECT (SELECT MIN(l_orderkey) * 2 FROM lineitem), 0
      UNION
      SELECT e.v, w.hop + 1
      FROM walk w JOIN e ON e.u = w.node
      WHERE w.hop < {_BFS_HOPS}
    )
    SELECT node, CAST(MIN(hop) AS INTEGER) AS hop
    FROM walk GROUP BY node ORDER BY node
    """,
)(_graph_bfs_hops)


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test: each documents.source vs the
# pooled rest of the corpus, over the n_chars length distribution. The
# classic corpus-drift / domain-shift readout a training-data pipeline
# runs per ingest batch.
#
# Exactness: ECDFs are never materialized as floats. D's numerator is the
# integer cross-multiplied form max_x |cum_s(x)*n_rest - cum_rest(x)*n_s|
# (all BIGINT, exact), and ks_d is ONE double division of identical
# integers -- bit-identical across engines with no rounding step.
#
# Scale shape: the corpus collapses to the (source x distinct-length)
# grid before any window runs -- counts via one hash-agg (map-side
# combine), then cumulative sums over the COMPRESSED VALUE DOMAIN
# (|distinct lengths| rows per source, partitioned by source), never over
# raw rows. At 100 TB the window input is ~10^3-10^6 tiny rows while the
# scan stays a two-column projection (source, n_chars -> pushed scan).
# ---------------------------------------------------------------------------


def _stats_ks_by_source(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("source", F.col("n_chars").alias("x"))
    c = docs.groupBy("source", "x").agg(F.count(F.lit(1)).alias("k"))
    grid = c.select("x").distinct()
    srcs = c.groupBy("source").agg(F.sum("k").alias("n_s"))
    n_total = c.agg(F.sum("k").alias("n"))
    filled = (
        srcs.select("source")
        .crossJoin(grid)
        .join(c, ["source", "x"], "left")
        .select("source", "x", F.coalesce("k", F.lit(0)).alias("k"))
    )
    w_s = W.partitionBy("source").orderBy("x")
    cums = filled.select(
        "source", "x", F.sum("k").over(w_s).alias("cum_s")
    )
    per_x = (
        c.groupBy("x").agg(F.sum("k").alias("kx"))
        .join(grid, "x")
    )
    w_all = W.orderBy("x")  # |distinct x| rows only -- domain-compressed
    cum_all = per_x.select("x", F.sum("kx").over(w_all).alias("cum_all"))
    j = (
        cums.join(cum_all, "x")
        .join(F.broadcast(srcs), "source")
        .crossJoin(F.broadcast(n_total))
        .select(
            "source",
            "n_s",
            F.abs(
                F.col("cum_s") * (F.col("n") - F.col("n_s"))
                - (F.col("cum_all") - F.col("cum_s")) * F.col("n_s")
            ).alias("diff"),
            (F.col("n") - F.col("n_s")).alias("n_rest"),
        )
    )
    return (
        j.groupBy("source", "n_s", "n_rest")
        .agg(F.max("diff").alias("d_num"))
        .select(
            "source",
            "n_s",
            "d_num",
            (
                F.col("d_num").cast("double")
                / (F.col("n_s") * F.col("n_rest")).cast("double")
            ).alias("ks_d"),
        )
        .orderBy("source")
    )


register(
    "stats_ks_by_source",
    """
    WITH c AS (
      SELECT source, n_chars AS x, CAST(COUNT(*) AS BIGINT) AS k
      FROM documents GROUP BY 1, 2
    ),
    grid AS (SELECT DISTINCT x FROM c),
    srcs AS (SELECT source, CAST(SUM(k) AS BIGINT) AS n_s FROM c GROUP BY 1),
    tot AS (SELECT CAST(SUM(k) AS BIGINT) AS n FROM c),
    filled AS (
      SELECT s.source, g.x, COALESCE(c.k, 0) AS k
      FROM (SELECT source FROM srcs) s
      CROSS JOIN grid g
      LEFT JOIN c ON c.source = s.source AND c.x = g.x
    ),
    cums AS (
      SELECT source, x,
             CAST(SUM(k) OVER (PARTITION BY source ORDER BY x) AS BIGINT) AS cum_s
      FROM filled
    ),
    cum_all AS (
      SELECT x, CAST(SUM(kx) OVER (ORDER BY x) AS BIGINT) AS cum_all
      FROM (SELECT x, CAST(SUM(k) AS BIGINT) AS kx FROM c GROUP BY x)
    ),
    d AS (
      SELECT cums.source, srcs.n_s, tot.n - srcs.n_s AS n_rest,
             ABS(cums.cum_s * (tot.n - srcs.n_s)
                 - (cum_all.cum_all - cums.cum_s) * srcs.n_s) AS diff
      FROM cums
      JOIN cum_all USING (x)
      JOIN srcs USING (source)
      CROSS JOIN tot
    )
    SELECT source, n_s, CAST(MAX(diff) AS BIGINT) AS d_num,
           CAST(MAX(diff) AS DOUBLE) / CAST(n_s * n_rest AS DOUBLE) AS ks_d
    FROM d GROUP BY source, n_s, n_rest
    ORDER BY source
    """,
)(_stats_ks_by_source)
