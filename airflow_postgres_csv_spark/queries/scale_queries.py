"""Scale-toolkit queries: the pre-planned skew mitigations from ``plans/skew.py``
exercised as oracle-checked corpus queries.

AQE handles *detected* skew at runtime; these helpers pre-plan around skew
you know about (power-law group keys, hot join keys). Salting is pure
restructuring — the results must be bit-identical to the unsalted plan —
so the DuckDB oracles here are the PLAIN formulations: the differential
check certifies that the salted rewrites change the physical shape only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.plans.skew import replicated_skew_join, salted_agg
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import dec, dsum, sql_dsum, t


def _salted_agg_fn(spark, sf_dir):
    # event_type has ~5 values over the whole corpus — the archetypal hot
    # group key. Phase 1 fans each key across 16 salt buckets (salt hashed
    # from the unique event_id), phase 2 merges 16 partials per key, so no
    # reduce task ever holds a full key's rows. Partials are exact decimals,
    # so the two-phase sum is bit-identical to the one-phase plan.
    ev = t(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n_events": ("sum", F.count(F.lit(1))),
            "total_value": ("sum", F.sum(dec("value"))),
        },
        salt_cols=["event_id"],
        n_salts=16,
    )
    return (
        out.select(
            "event_type",
            "n_events",
            F.col("total_value").cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


register(
    "skew_salted_agg_events",
    f"""
    SELECT event_type, COUNT(*) AS n_events,
           {sql_dsum("value", "total_value")}
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)(_salted_agg_fn)


def _salted_join_fn(spark, sf_dir):
    # lineitem (big, salted on the unique line id) joined to supplier
    # (small side, replicated 8x) on the join key + salt: each
    # (l_suppkey, salt) reduce bucket holds ~1/8 of a hot supplier's rows.
    # The oracle is the plain join — salting must not change a single row.
    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = replicated_skew_join(
        l,
        s.withColumnRenamed("s_suppkey", "l_suppkey"),
        on=["l_suppkey"],
        salt_cols=["l_orderkey", "l_linenumber"],
        n_salts=8,
    )
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
        )
        .orderBy("s_nationkey")
    )


register(
    "join_salted_replicated",
    f"""
    SELECT s_nationkey, COUNT(*) AS n_lines,
           {sql_dsum("l_extendedprice", "revenue")}
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey ORDER BY s_nationkey
    """,
)(_salted_join_fn)


# ---------------------------------------------------------------------------
# Bucketed co-located join: both sides persisted bucketed by the join key
# (8 buckets, parquet, warehouse-managed), so the sort-merge join reads
# bucket i against bucket i with NO Exchange on either side — the
# pre-shuffle trade every repeated big-big join should make at 100 TB
# (pay the shuffle once at write time, never at read time). The MERGE
# hint keeps the demo on the SMJ path (at this sf the optimizer would
# otherwise broadcast, which ignores bucketing). The oracle is the PLAIN
# join+agg — bucketing must change the physical shape only.
# tests/test_plans.py asserts the executed plan has no shuffle.
# ---------------------------------------------------------------------------


def _bucketed_colocated_fn(spark, sf_dir):
    import shutil
    from urllib.parse import urlparse

    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    # The warehouse dir outlives the (per-process Derby) metastore, so a
    # table location can exist without a catalog entry: clear both.
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for tbl in ("bkt_customer", "bkt_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)
    cust.write.mode("overwrite").format("parquet").bucketBy(8, "c_custkey").sortBy(
        "c_custkey"
    ).saveAsTable("bkt_customer")
    orders.write.mode("overwrite").format("parquet").bucketBy(8, "o_custkey").sortBy(
        "o_custkey"
    ).saveAsTable("bkt_orders")
    c = spark.table("bkt_customer")
    o = spark.table("bkt_orders")
    return (
        c.hint("merge")
        .join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "segment_revenue"),
        )
        .orderBy("c_mktsegment")
    )


register(
    "join_bucketed_colocated",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS segment_revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)(_bucketed_colocated_fn)


# ---------------------------------------------------------------------------
# Bloom-filter pre-join pruning (operators/sketches.py bloom_build /
# bloom_might_contain): build the filter over the small side's keys
# (urgent orders), drop big-side rows (lineitem) that cannot match BEFORE
# any shuffle. The filter is a (word_idx, word) relation — md5/KM bucket
# bits — so the DuckDB oracle replays the exact bit matrix and the pass
# counts compare EXACTLY, not just within an error bound. no_false_neg is
# the Bloom guarantee (every true match survives pruning).
# ---------------------------------------------------------------------------

register(
    "bloom_prejoin_prune",
    """
    WITH keys AS (
      SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    kb AS (
      SELECT ('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT AS h1,
             ('0x' || substring(md5(CAST(k AS VARCHAR)), 9, 8))::BIGINT AS h2
      FROM keys
    ),
    bits AS (
      SELECT DISTINCT ((h1 + i * h2) % 8192) AS bit
      FROM kb, (SELECT unnest([0, 1, 2, 3]) AS i)
    ),
    words AS (
      SELECT CAST(bit // 63 AS INT) AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(bit % 63 AS INT)) AS word
      FROM bits GROUP BY 1
    ),
    lkeys AS (
      SELECT DISTINCT l_orderkey,
             ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT AS h1,
             ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 9, 8))::BIGINT AS h2
      FROM lineitem
    ),
    lbits AS (
      SELECT l_orderkey, ((h1 + i * h2) % 8192) AS bit
      FROM lkeys, (SELECT unnest([0, 1, 2, 3]) AS i)
    ),
    perkey AS (
      SELECT b.l_orderkey,
             SUM(CASE WHEN (COALESCE(w.word, 0) &
                            (CAST(1 AS BIGINT) << CAST(b.bit % 63 AS INT))) <> 0
                      THEN 1 ELSE 0 END) AS n_hits
      FROM lbits b LEFT JOIN words w ON w.word_idx = CAST(b.bit // 63 AS INT)
      GROUP BY b.l_orderkey
    ),
    agg AS (
      SELECT COUNT(*) AS n_bloom_pass
      FROM lineitem
      WHERE l_orderkey IN (SELECT l_orderkey FROM perkey WHERE n_hits = 4)
    ),
    exact AS (
      SELECT COUNT(*) AS n_exact
      FROM lineitem WHERE l_orderkey IN (SELECT k FROM keys)
    )
    SELECT a.n_bloom_pass, e.n_exact,
           a.n_bloom_pass - e.n_exact AS n_false_pos,
           CAST(a.n_bloom_pass >= e.n_exact AS INT) AS no_false_neg
    FROM agg a CROSS JOIN exact e
    """,
)(
    lambda spark, sf_dir: _bloom_prejoin_fn(spark, sf_dir)
)


def _bloom_prejoin_fn(spark, sf_dir):
    from airflow_postgres_csv_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    urgent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    bf = bloom_build(urgent.select("o_orderkey"), "o_orderkey", k_hashes=4, m_bits=8192)
    pruned = bloom_might_contain(li, bf, "l_orderkey", k_hashes=4, m_bits=8192)
    n_pass = pruned.agg(F.count(F.lit(1)).alias("n_bloom_pass"))
    n_exact = (
        li.join(urgent.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    return (
        n_pass.crossJoin(F.broadcast(n_exact))  # two 1-row aggregates
        .select(
            "n_bloom_pass",
            "n_exact",
            (F.col("n_bloom_pass") - F.col("n_exact")).alias("n_false_pos"),
            (F.col("n_bloom_pass") >= F.col("n_exact")).cast("int").alias("no_false_neg"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order layout zone-map: Morton-interleave (l_suppkey, shipdate-day) and
# summarize per-bucket min/max extents of both dimensions — the file-level
# statistics a reader prunes with after an OPTIMIZE-ZORDER-style rewrite
# (operators/layout.py). Dimensions are chosen to fill the 12-bit grid at
# bench scale (suppkey ≤ 2^12 through sf0.4; day-index since 1992-01-01
# spans ~2500 < 2^12), so the bucketing is non-degenerate at every test
# SF. The whole computation is a static bitwise expression tree inside
# whole-stage codegen; the oracle replays the interleave with generated
# unrolled integer arithmetic — an independent formulation of the same
# Morton code.
# ---------------------------------------------------------------------------

_Z_BITS = 12
_Z_BUCKET_BITS = 8
_Z_EPOCH = "1992-01-01"


def _layout_zorder_extents(spark, sf_dir):
    from airflow_postgres_csv_spark.operators.layout import zorder_extents

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").cast("long").alias("supp"),
        F.datediff("l_shipdate", F.lit(_Z_EPOCH)).cast("long").alias("day"),
    )
    return zorder_extents(
        li, "supp", "day", bits=_Z_BITS, bucket_bits=_Z_BUCKET_BITS
    ).orderBy("bucket")


def _morton_terms(col: str, bit_offset: int, bits: int) -> str:
    return " + ".join(
        f"((({col} >> {i}) & 1) * {1 << (2 * i + bit_offset)})" for i in range(bits)
    )


register(
    "layout_zorder_extents",
    f"""
    WITH d AS (
      SELECT CAST(l_suppkey AS BIGINT) AS supp,
             datediff('day', DATE '{_Z_EPOCH}', l_shipdate) AS day
      FROM lineitem
    ),
    z AS (
      SELECT supp, day,
             CAST({_morton_terms("supp", 0, _Z_BITS)}
                + {_morton_terms("day", 1, _Z_BITS)} AS BIGINT) AS zv
      FROM d
    )
    SELECT CAST(zv >> {2 * _Z_BITS - _Z_BUCKET_BITS} AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(supp) AS min_x, MAX(supp) AS max_x,
           MIN(day) AS min_y, MAX(day) AS max_y
    FROM z GROUP BY 1 ORDER BY 1
    """,
)(_layout_zorder_extents)
