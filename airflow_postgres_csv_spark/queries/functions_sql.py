"""Scalar / expression function surface: string, date/time, math,
conditional, cast, JSON, array, and aggregation-composition functions —
the function vocabulary of the delegated SQL (reference operators.py:80).

All exact functions (string ops, floor/ceil/abs/sqrt, integer math, casts)
run over full tables. Transcendentals (ln/exp/pow) are applied only after
aggregation to a handful of rows and rounded — Java's Math and C's libm
agree to ≤1 ulp but are not both correctly-rounded, so full-table
comparisons of raw transcendental outputs would be flaky by design.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import dec, t, utc_date, utc_ntz

# ---------------------------------------------------------------------------
# String functions.
# ---------------------------------------------------------------------------

register(
    "string_funcs",
    """
    SELECT p_partkey,
           UPPER(p_name) AS uname,
           LOWER(p_brand) AS lbrand,
           SUBSTRING(p_type, 1, 5) AS type5,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           TRIM(CONCAT(' ', p_name, ' ')) AS trimmed,
           REPLACE(p_name, 'a', '_') AS repl,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size4,
           CASE WHEN p_name LIKE '%ab%' THEN 1 ELSE 0 END AS has_ab,
           STRPOS(p_name, 'e') AS first_e
    FROM part
    ORDER BY p_partkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.upper("p_name").alias("uname"),
            F.lower("p_brand").alias("lbrand"),
            F.substring("p_type", 1, 5).alias("type5"),
            F.length("p_name").alias("name_len"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
            F.replace(F.col("p_name"), F.lit("a"), F.lit("_")).alias("repl"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
            F.when(F.col("p_name").like("%ab%"), 1).otherwise(0).alias("has_ab"),
            F.instr(F.col("p_name"), "e").alias("first_e"),
        )
        .orderBy("p_partkey")
    )
)

register(
    "regexp_funcs",
    """
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           LENGTH(regexp_replace(text, '[aeiou]', '', 'g')) AS novowel_len,
           CASE WHEN regexp_matches(text, 'spark|data') THEN 1 ELSE 0 END AS mentions,
           len(regexp_extract_all(text, '([a-z]+)', 1)) AS n_words
    FROM documents
    ORDER BY doc_id
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
            F.length(F.regexp_replace("text", "[aeiou]", "")).alias("novowel_len"),
            F.col("text").rlike("spark|data").cast("int").alias("mentions"),
            F.size(F.regexp_extract_all("text", F.lit("([a-z]+)"), 1)).alias("n_words"),
        )
        .orderBy("doc_id")
    )
)

# Ordered string aggregation (PG string_agg / Spark listagg-equivalent via
# sorted collect_list — deterministic because we sort inside the array).
register(
    "string_agg_sorted",
    """
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
        .orderBy("n_regionkey")
    )
)


# ---------------------------------------------------------------------------
# Date / time functions. All outputs string-formatted or integer so the
# comparison is engine-neutral; weekday uses ISO numbering on both sides.
# ---------------------------------------------------------------------------

register(
    "date_funcs",
    """
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           EXTRACT(day FROM o_orderdate) AS dy,
           isodow(o_orderdate) AS iso_dow,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    ORDER BY o_orderkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "order_month"
            ),
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.dayofmonth("o_orderdate").cast("long").alias("dy"),
            (F.weekday("o_orderdate") + 1).cast("long").alias("iso_dow"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
            )
            .cast("long")
            .alias("days_since"),
            F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus3m"),
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
        )
        .orderBy("o_orderkey")
    )
)


# ---------------------------------------------------------------------------
# Math functions. Exact ops over the full table; transcendentals post-agg.
# ---------------------------------------------------------------------------

register(
    "math_funcs_exact",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(0.7 AS DECIMAL(2,1)), 2) AS DOUBLE) AS scaled,
           FLOOR(l_quantity) AS qfloor,
           CEIL(l_quantity) AS qceil,
           ABS(l_quantity - 25) AS qdev,
           SQRT(l_quantity) AS qsqrt,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           CAST(SIGN(l_discount - 0.05) AS INT) AS disc_sign
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(dec("l_extendedprice") * F.lit(0.7).cast("decimal(2,1)"), 2)
            .cast("double")
            .alias("scaled"),
            F.floor("l_quantity").cast("double").alias("qfloor"),
            F.ceil("l_quantity").cast("double").alias("qceil"),
            F.abs(F.col("l_quantity") - 25).alias("qdev"),
            F.sqrt("l_quantity").alias("qsqrt"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
            F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
)

register(
    "math_funcs_transcendental",
    """
    SELECT l_returnflag,
           ROUND(LN(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)), 9) AS ln_qty,
           ROUND(LOG10(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)), 9) AS log10_price,
           ROUND(POWER(COUNT(*), 0.5), 9) AS sqrt_n,
           ROUND(EXP(CAST(COUNT(DISTINCT l_linestatus) AS DOUBLE)), 9) AS exp_status
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.log(F.sum(dec("l_quantity")).cast("double")), 9).alias("ln_qty"),
            F.round(F.log10(F.sum(dec("l_extendedprice")).cast("double")), 9).alias(
                "log10_price"
            ),
            F.round(F.pow(F.count(F.lit(1)), 0.5), 9).alias("sqrt_n"),
            F.round(F.exp(F.countDistinct("l_linestatus").cast("double")), 9).alias(
                "exp_status"
            ),
        )
        .orderBy("l_returnflag")
    )
)


# ---------------------------------------------------------------------------
# Conditionals and null handling.
# ---------------------------------------------------------------------------

register(
    "conditional_funcs",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_class,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           GREATEST(c_acctbal, 0.0) AS bal_pos,
           LEAST(c_acctbal, 1000.0) AS bal_capped,
           CASE WHEN c_nationkey % 2 = 0 THEN NULL ELSE c_nationkey END AS odd_nation
    FROM customer
    ORDER BY c_custkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "low")
            .otherwise("high")
            .alias("bal_class"),
            F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
                "seg_or_other"
            ),
            F.greatest("c_acctbal", F.lit(0.0)).alias("bal_pos"),
            F.least("c_acctbal", F.lit(1000.0)).alias("bal_capped"),
            F.when(F.col("c_nationkey") % 2 == 0, F.lit(None).cast("int"))
            .otherwise(F.col("c_nationkey"))
            .alias("odd_nation"),
        )
        .orderBy("c_custkey")
    )
)


# ---------------------------------------------------------------------------
# Casts. Note: double→int differs by dialect (Spark truncates, DuckDB
# rounds), so integer conversion goes through explicit FLOOR on both sides.
# try_cast on malformed input returns NULL in both engines.
# ---------------------------------------------------------------------------

register(
    "cast_funcs",
    """
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast_null,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec
    FROM orders
    ORDER BY o_orderkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_orderkey").cast("string").alias("key_str"),
            F.floor("o_totalprice").alias("price_floor"),
            F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
            F.col("o_orderpriority").try_cast("long").alias("bad_cast_null"),
            dec("o_totalprice").cast("double").alias("price_dec"),
        )
        .orderBy("o_orderkey")
    )
)


# ---------------------------------------------------------------------------
# JSON functions over events.props (JSON text column).
# ---------------------------------------------------------------------------

register(
    "json_funcs",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.missing') AS missing_null
    FROM events
    ORDER BY event_id
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$.k").cast("long").alias("k_int"),
            F.get_json_object("props", "$.missing").alias("missing_null"),
        )
        .orderBy("event_id")
    )
)


# ---------------------------------------------------------------------------
# Array functions over embeddings (ArrayType(FloatType), 64-dim).
# Element access and sequential folds are order-identical in both engines;
# floats are cast to double before arithmetic (exact widening).
# ---------------------------------------------------------------------------

register(
    "array_funcs",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_el,
           CAST(embedding[64] AS DOUBLE) AS last_el,
           list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (a, b) -> a + b) AS el_sum,
           CAST(list_max(embedding) AS DOUBLE) AS el_max
    FROM embeddings
    ORDER BY vec_id
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.element_at("embedding", 1).cast("double").alias("first_el"),
            F.element_at("embedding", 64).cast("double").alias("last_el"),
            F.aggregate(
                F.transform(F.col("embedding"), lambda x: x.cast("double")),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            ).alias("el_sum"),
            F.array_max("embedding").cast("double").alias("el_max"),
        )
        .orderBy("vec_id")
    )
)


# ---------------------------------------------------------------------------
# Pivot (Spark .pivot) vs conditional-aggregation oracle; plus unpivot via
# stack() — PG would spell these crosstab / UNION ALL.
# ---------------------------------------------------------------------------

register(
    "pivot_status_by_flag",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS F,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS O
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=["F", "O"])
        .orderBy("l_returnflag")
    )
)

register(
    "unpivot_stack",
    """
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
    ) u
    ORDER BY c_custkey, metric
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "customer")
        .selectExpr(
            "c_custkey",
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)",
        )
        .orderBy("c_custkey", "metric")
    )
)


# ---------------------------------------------------------------------------
# Statistical aggregates: stddev/variance (sample), corr, covar.
# Variance is computed from exact-decimal sums (sum, sum of squares, n) so
# both engines see bit-identical doubles; raw stddev() over doubles would
# depend on summation order.
# ---------------------------------------------------------------------------

register(
    "stats_aggregates",
    """
    SELECT l_returnflag,
           ROUND((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
             / (COUNT(*) - 1), 6) AS var_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)(
    lambda spark, sf_dir: _stats_aggregates(spark, sf_dir)
)


def _stats_aggregates(spark, sf_dir):
    q = dec("l_quantity")
    n = F.count(F.lit(1))
    sum_q = F.sum(q).cast("double")
    sum_q2 = F.sum(q * q).cast("double")
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round((sum_q2 - sum_q * sum_q / n) / (n - F.lit(1)), 6).alias("var_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Exact percentile (interpolated, PG percentile_cont semantics).
# ---------------------------------------------------------------------------

register(
    "percentile_cont",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
            F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
        )
        .orderBy("l_returnflag")
    )
)


# ---------------------------------------------------------------------------
# Map functions (create_map / map_keys / map_values / element_at /
# map_contains_key / map_concat / map_entries round-trip / map_filter /
# transform_values). DuckDB's element_at returns a single-element LIST, so
# the oracle indexes [1] to surface the same scalar Spark returns; a missing
# key is NULL on both sides. cardinality() is cast to INT to match size().
# ---------------------------------------------------------------------------

register(
    "map_funcs",
    """
    WITH m AS (
        SELECT p_partkey,
               MAP(['brand','type','size'],
                   [p_brand, p_type, CAST(p_size AS VARCHAR)]) AS mp
        FROM part
    )
    SELECT p_partkey,
           array_to_string(list_sort(map_keys(mp)), ',') AS keys_sorted,
           array_to_string(list_sort(map_values(mp)), ',') AS vals_sorted,
           element_at(mp, 'brand')[1] AS brand_val,
           element_at(mp, 'nope')[1] AS missing_val,
           CAST(cardinality(mp) AS INT) AS m_size,
           CAST(list_contains(map_keys(mp), 'type') AS INT) AS has_type,
           CAST(cardinality(map_concat(mp, MAP(['extra'], ['x']))) AS INT)
               AS concat_size,
           CAST(cardinality(mp) AS INT) AS entries_roundtrip_size,
           array_to_string(list_sort(list_filter(map_keys(mp), k -> k <> 'size')), ',')
               AS filtered_keys,
           UPPER(element_at(mp, 'brand')[1]) AS upper_brand
    FROM m
    ORDER BY p_partkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.create_map(
                F.lit("brand"), F.col("p_brand"),
                F.lit("type"), F.col("p_type"),
                F.lit("size"), F.col("p_size").cast("string"),
            ).alias("mp"),
        )
        .select(
            "p_partkey",
            # array_join → scalar string: the harness canonicalizer sorts
            # rows via pandas and chokes on unhashable list cells
            F.array_join(F.sort_array(F.map_keys("mp")), ",").alias("keys_sorted"),
            F.array_join(F.sort_array(F.map_values("mp")), ",").alias("vals_sorted"),
            F.element_at("mp", F.lit("brand")).alias("brand_val"),
            F.element_at("mp", F.lit("nope")).alias("missing_val"),
            F.size("mp").alias("m_size"),
            F.map_contains_key("mp", "type").cast("int").alias("has_type"),
            F.size(
                F.map_concat("mp", F.create_map(F.lit("extra"), F.lit("x")))
            ).alias("concat_size"),
            F.size(F.map_from_entries(F.map_entries("mp"))).alias(
                "entries_roundtrip_size"
            ),
            F.array_join(
                F.sort_array(
                    F.map_keys(F.map_filter("mp", lambda k, v: k != F.lit("size")))
                ),
                ",",
            ).alias("filtered_keys"),
            F.element_at(
                F.transform_values("mp", lambda k, v: F.upper(v)),
                F.lit("brand"),
            ).alias("upper_brand"),
        )
        .orderBy("p_partkey")
    )
)


# ---------------------------------------------------------------------------
# Schema-driven JSON parsing (from_json → typed struct), complementing the
# path-extraction coverage of json_funcs: parse events.props against a
# declared schema, bucket the typed field, aggregate. At scale from_json
# with an explicit schema is the right corpus-JSON path — single parse,
# typed columns, no per-access re-parsing.
# ---------------------------------------------------------------------------

register(
    "json_from_schema_agg",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) // 10 AS k_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY k_bucket
    ORDER BY k_bucket
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "events")
        .select(
            F.from_json("props", "k INT").getField("k").alias("k_typed"),
            "value",
        )
        .groupBy((F.col("k_typed") / 10).cast("int").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .orderBy("k_bucket")
    )
)


# ---------------------------------------------------------------------------
# VARIANT type (Spark 4 native semi-structured storage). parse_json stores
# the document once in a binary columnar form; variant_get does typed path
# extraction without re-parsing — the scale answer to string-JSON columns
# (events.props). The oracle replays the same extractions with DuckDB's
# JSON functions; to_json(variant) canonicalizes to minified JSON, which
# DuckDB's json() also produces.
# ---------------------------------------------------------------------------

register(
    "variant_funcs",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json('{"k": ' || json_extract_string(props, '$.k') || '}') AS VARCHAR) AS canon,
           json_extract_string(props, '$.missing') AS missing_null
    FROM events
    ORDER BY event_id
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "events")
        .select("event_id", F.parse_json("props").alias("v"))
        .select(
            "event_id",
            F.expr("variant_get(v, '$.k', 'int')").alias("k_int"),
            F.expr("variant_get(v, '$.k', 'string')").alias("k_str"),
            F.to_json("v").alias("canon"),
            F.expr("variant_get(v, '$.missing', 'string')").alias("missing_null"),
        )
        .orderBy("event_id")
    )
)


# ---------------------------------------------------------------------------
# Higher-order (lambda) functions over array columns — filter/exists/forall/
# zip_with/reduce/sort. These run inside the JVM expression engine (no
# Python), which is exactly why array-heavy corpus work (embeddings, token
# lists) should reach for them before any UDF. Element-wise folds are
# sequential, so casting each element to double first makes the arithmetic
# bit-identical to DuckDB's list_* lambdas.
# ---------------------------------------------------------------------------

register(
    "higher_order_funcs",
    """
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           len(list_filter(embedding, x -> x > 0.2)) > 0 AS any_big,
           len(list_filter(embedding, x -> NOT (x > -1 AND x < 1))) = 0 AS all_unit,
           list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS sq_norm,
           CAST(list_sort(embedding)[2] AS DOUBLE) AS second_min,
           CAST(list_reverse_sort(embedding)[1] AS DOUBLE) AS max_el
    FROM embeddings
    ORDER BY vec_id
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
            F.exists("embedding", lambda x: x > 0.2).alias("any_big"),
            F.forall("embedding", lambda x: (x > -1) & (x < 1)).alias("all_unit"),
            F.aggregate(
                F.zip_with(
                    "embedding",
                    "embedding",
                    lambda x, y: x.cast("double") * y.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sq_norm"),
            F.element_at(F.array_sort("embedding"), 2).cast("double").alias("second_min"),
            F.element_at(F.sort_array("embedding", asc=False), 1).cast("double").alias("max_el"),
        )
        .orderBy("vec_id")
    )
)


# ---------------------------------------------------------------------------
# Mergeable HLL sketches (Apache DataSketches, Spark 3.5+). Unlike
# approx_count_distinct (whose HLL++ state is internal), hll_sketch_agg
# emits a *binary, mergeable* sketch: partial sketches built per partition
# or per group can be unioned later — the building block for incremental
# distinct-count rollups over 100 TB (sketch per day-partition, union at
# query time). Engines' sketches differ bit-wise, so the oracle checks the
# self-verifying invariant: the union-of-group-sketches estimate must be
# within 5% of the exact global distinct (and per-group estimates within
# 5% of exact per-group counts).
# ---------------------------------------------------------------------------

def _hll_fn(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    per_group = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_nd"),
        F.hll_sketch_agg("user_id").alias("_sk"),
    )
    # Union the per-group sketches into one global estimate — the mergeable
    # path a 100 TB rollup would take (per-partition sketches, one union).
    union_est = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_union_est")
    )
    exact_global = ev.agg(F.countDistinct("user_id").alias("_exact_global"))
    return (
        per_group.withColumn("_est", F.hll_sketch_estimate("_sk"))
        .crossJoin(F.broadcast(union_est))  # 1-row aggregates: broadcast is exact-size-safe
        .crossJoin(F.broadcast(exact_global))
        .select(
            "event_type",
            "exact_nd",
            (
                (F.col("_est") >= F.col("exact_nd") * 0.95)
                & (F.col("_est") <= F.col("exact_nd") * 1.05)
            )
            .cast("int")
            .alias("group_ok"),
            (
                (F.col("_union_est") >= F.col("_exact_global") * 0.95)
                & (F.col("_union_est") <= F.col("_exact_global") * 1.05)
            )
            .cast("int")
            .alias("union_ok"),
        )
        .orderBy("event_type")
    )

register(
    "hll_sketch_mergeable",
    """
    WITH g AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_nd
      FROM events GROUP BY event_type
    )
    SELECT event_type, exact_nd, 1 AS group_ok, 1 AS union_ok
    FROM g ORDER BY event_type
    """,
)(_hll_fn)


# ---------------------------------------------------------------------------
# Theta sketches (DataSketches): mergeable SET-OPERATION sketches — unlike
# HLL, theta supports intersection/difference, which is the scale tool for
# estimating cross-corpus n-gram overlap (decontamination triage) without
# materializing the pairwise distinct-join. Per-lang sketches over 3-gram
# shingles, pairwise intersection/union estimates, invariant-checked against
# the exact distinct-intersection computed alongside (10% tolerance: theta
# relative error grows on small intersections). The oracle replays the exact
# set sizes; estimate flags are 1 when the sketch is within tolerance.
# ---------------------------------------------------------------------------

def _theta_overlap_fn(spark, sf_dir):
    from airflow_postgres_csv_spark.functions import texts as X

    docs = t(spark, sf_dir, "documents")
    # ONE wide shuffle for the whole query: raw (lang, shingle) pairs are
    # grouped by shingle and collect_set dedups langs in the aggregate
    # (subsuming the per-(lang,shingle) DISTINCT a naive plan would
    # shuffle for separately). Everything downstream — per-lang sketches
    # AND exact pair intersections — derives from this one table, so the
    # old shape's second full shuffle + shingle self-join (the scale
    # bottleneck: shingle-keyed join of the corpus against itself) are
    # gone. Pair expansion is an in-row lambda over the <=5-element lang
    # set, never a join.
    lang_sets = (
        docs.withColumn("_toks", X.tokens("text"))
        .select(
            F.col("lang"),
            F.explode(X.ngrams_of_tokens(F.col("_toks"), 3)).alias("shingle"),
        )
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_set("lang")).alias("ls"))
    )
    per_lang = (
        lang_sets.select(F.explode("ls").alias("lang"), "shingle")
        .groupBy("lang")
        .agg(
            F.theta_sketch_agg("shingle").alias("sk"),
            F.count(F.lit(1)).alias("exact_nd"),
        )
    )
    a = per_lang.select(
        F.col("lang").alias("lang_a"), F.col("sk").alias("sk_a"), F.col("exact_nd").alias("nd_a")
    )
    b = per_lang.select(
        F.col("lang").alias("lang_b"), F.col("sk").alias("sk_b"), F.col("exact_nd").alias("nd_b")
    )
    # 5 langs -> 10 pairs: the pair grid is broadcast-tiny; the heavy work
    # (shingle grouping + sketch build) happened in ONE pass over the corpus.
    est = (
        a.crossJoin(b)
        .filter(F.col("lang_a") < F.col("lang_b"))
        .select(
            "lang_a",
            "lang_b",
            "nd_a",
            "nd_b",
            F.theta_sketch_estimate(
                F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
            ).alias("inter_est"),
            F.theta_sketch_estimate(F.theta_union(F.col("sk_a"), F.col("sk_b"))).alias(
                "union_est"
            ),
        )
    )
    exact = (
        lang_sets.filter(F.size("ls") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ls, (x, i) -> "
                    "transform(slice(ls, i + 2, size(ls)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("lang_a"), F.col("p.b").alias("lang_b"))
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    return (
        est.join(exact, ["lang_a", "lang_b"])
        .select(
            "lang_a",
            "lang_b",
            "exact_inter",
            (F.col("nd_a") + F.col("nd_b") - F.col("exact_inter")).alias("exact_union"),
            F.round(
                F.col("exact_inter").cast("double")
                / (F.col("nd_a") + F.col("nd_b") - F.col("exact_inter")),
                9,
            ).alias("jaccard"),
            (
                (F.col("inter_est") >= F.col("exact_inter") * 0.9)
                & (F.col("inter_est") <= F.col("exact_inter") * 1.1)
            )
            .cast("int")
            .alias("inter_ok"),
            (
                (F.col("union_est") >= F.col("exact_union") * 0.9)
                & (F.col("union_est") <= F.col("exact_union") * 1.1)
            )
            .cast("int")
            .alias("union_ok"),
        )
        .orderBy("lang_a", "lang_b")
    )


register(
    "theta_sketch_overlap",
    """
    WITH toks AS (
      SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tk
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT d.lang,
             unnest(list_transform(range(1, len(tk) - 1),
                                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
      FROM toks JOIN documents d USING (doc_id)
    ),
    nd AS (SELECT lang, COUNT(*) AS exact_nd FROM sh GROUP BY lang),
    inter AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS exact_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang < b.lang
      GROUP BY 1, 2
    )
    SELECT lang_a, lang_b, exact_inter,
           na.exact_nd + nb.exact_nd - exact_inter AS exact_union,
           ROUND(CAST(exact_inter AS DOUBLE)
                 / (na.exact_nd + nb.exact_nd - exact_inter), 9) AS jaccard,
           1 AS inter_ok, 1 AS union_ok
    FROM inter
    JOIN nd na ON na.lang = lang_a
    JOIN nd nb ON nb.lang = lang_b
    ORDER BY lang_a, lang_b
    """,
)(_theta_overlap_fn)


# ---------------------------------------------------------------------------
# KLL quantile sketches: mergeable distributed quantiles (per-group sketches,
# one merge — the rollup path percentile_approx cannot take, since KLL
# sketches are first-class values that survive shuffles/storage). Invariant:
# the exact rank of each estimated quantile must be within 3% of the target
# (KLL k=200 default => ~1.65% rank error at 99% confidence).
# ---------------------------------------------------------------------------

def _kll_quantile_fn(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("price")
    )
    per_flag = l.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("price").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    est = per_flag.select(
        "l_returnflag",
        "n_rows",
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.5)).alias("q50_est"),
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.9)).alias("q90_est"),
    )
    # exact rank of each estimate, computed in the same engine: one extra
    # broadcast of the 3-row estimate grid against the fact scan.
    ranked = (
        l.join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("n_rows").alias("n_rows"),
            (
                F.sum((F.col("price") <= F.col("q50_est")).cast("long"))
                / F.first("n_rows")
            ).alias("q50_rank"),
            (
                F.sum((F.col("price") <= F.col("q90_est")).cast("long"))
                / F.first("n_rows")
            ).alias("q90_rank"),
        )
    )
    # merged global sketch (the mergeable path): rank-check the merged q50.
    merged = per_flag.agg(
        F.kll_sketch_get_quantile_double(
            F.kll_merge_agg_double("sk"), F.lit(0.5)
        ).alias("g50_est")
    )
    g_rank = (
        l.crossJoin(F.broadcast(merged))
        .agg(
            (
                F.sum((F.col("price") <= F.col("g50_est")).cast("long"))
                / F.count(F.lit(1))
            ).alias("g50_rank")
        )
    )
    return (
        ranked.crossJoin(F.broadcast(g_rank))
        .select(
            "l_returnflag",
            "n_rows",
            (F.abs(F.col("q50_rank") - 0.5) <= 0.03).cast("int").alias("q50_ok"),
            (F.abs(F.col("q90_rank") - 0.9) <= 0.03).cast("int").alias("q90_ok"),
            (F.abs(F.col("g50_rank") - 0.5) <= 0.03).cast("int").alias("global_q50_ok"),
        )
        .orderBy("l_returnflag")
    )


register(
    "kll_quantile_sketch",
    """
    SELECT l_returnflag, COUNT(*) AS n_rows,
           1 AS q50_ok, 1 AS q90_ok, 1 AS global_q50_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)(_kll_quantile_fn)


# ---------------------------------------------------------------------------
# try_* arithmetic: the ANSI-mode-safe variants (the engine runs with
# spark.sql.ansi.enabled=true for Postgres-parity erroring, so overflow /
# divide-by-zero must be opted OUT per-expression via try_add/try_divide —
# SURVEY §7 trap). DuckDB oracle expresses the same null-on-error semantics
# with guards.
# ---------------------------------------------------------------------------

register(
    "try_arith_funcs",
    """
    SELECT o_orderkey,
           CASE WHEN (o_orderkey % 3) = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 3) END AS safe_div,
           CASE WHEN o_orderkey = 0 THEN 9223372036854775807
                ELSE CAST(NULL AS BIGINT) END AS overflow_null,
           o_orderkey * 2 AS mult_ok,
           TRY_CAST(o_orderpriority AS DOUBLE) AS bad_double
    FROM orders ORDER BY o_orderkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.try_divide("o_totalprice", F.col("o_orderkey") % 3).alias("safe_div"),
            # every o_orderkey >= 1, so this long add always overflows:
            # under ANSI mode a plain + would raise; try_add yields NULL
            F.try_add(F.col("o_orderkey"), F.lit(9223372036854775807)).alias(
                "overflow_null"
            ),
            F.try_multiply(F.col("o_orderkey"), F.lit(2)).alias("mult_ok"),
            F.col("o_orderpriority").try_cast("double").alias("bad_double"),
        )
        .orderBy("o_orderkey")
    )
)


# ---------------------------------------------------------------------------
# Edit-distance fuzzy matching: levenshtein pairs over nation names —
# the building block for small-domain entity resolution (joins on
# near-equal codes/names). Bounded variant (threshold arg) lets Spark
# early-exit the DP at scale.
# ---------------------------------------------------------------------------

register(
    "fuzzy_levenshtein_pairs",
    """
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           levenshtein(a.n_name, b.n_name) AS dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 2
    ORDER BY name_a, name_b
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "nation")
        .alias("a")
        .join(
            t(spark, sf_dir, "nation").alias("b"),
            F.col("a.n_nationkey") < F.col("b.n_nationkey"),
        )
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            F.levenshtein(F.col("a.n_name"), F.col("b.n_name")).alias("dist"),
        )
        .filter(F.col("dist") <= 2)
        .orderBy("name_a", "name_b")
    )
)


# Second string-function tranche: the PostgreSQL-surface functions not in
# string_funcs (translate/reverse/repeat/left/right/ascii/split_part/
# trim-with-charset/predicate trio). initcap is Spark-only (DuckDB lacks
# it), so it is exercised via a locale-free manual equivalent on the
# oracle side would be fragile — omitted here, covered by text casing in
# string_funcs (UPPER/LOWER).
register(
    "string_funcs2",
    """
    SELECT p_partkey,
           translate(p_brand, '#', '_') AS brand_tr,
           reverse(p_type) AS type_rev,
           repeat(p_brand, 2) AS brand2,
           left(p_name, 6) AS name_l6,
           right(p_name, 4) AS name_r4,
           ascii(p_name) AS first_cp,
           split_part(p_type, ' ', 1) AS type_head,
           ltrim(p_name, 'aeiou') AS name_novowel_prefix,
           CAST(contains(p_name, 'an') AS INT) AS has_an,
           CAST(starts_with(p_type, 'STANDARD') AS INT) AS is_std,
           CAST(ends_with(p_brand, '5') AS INT) AS brand_ends5
    FROM part
    ORDER BY p_partkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.translate("p_brand", "#", "_").alias("brand_tr"),
            F.reverse("p_type").alias("type_rev"),
            F.repeat("p_brand", 2).alias("brand2"),
            F.substring("p_name", 1, 6).alias("name_l6"),
            F.expr("right(p_name, 4)").alias("name_r4"),
            F.ascii("p_name").alias("first_cp"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
            F.ltrim(F.col("p_name"), F.lit("aeiou")).alias("name_novowel_prefix"),
            F.contains(F.col("p_name"), F.lit("an")).cast("int").alias("has_an"),
            F.startswith(F.col("p_type"), F.lit("STANDARD")).cast("int").alias("is_std"),
            F.endswith(F.col("p_brand"), F.lit("5")).cast("int").alias("brand_ends5"),
        )
        .orderBy("p_partkey")
    )
)


# Bitwise / boolean / conditional aggregate tranche — integer-exact on
# both engines (no float accumulation anywhere). median over BIGINT
# interpolates at most to .5 — exactly representable, engine-stable.
register(
    "agg_bit_bool",
    """
    SELECT l_returnflag,
           bit_and(l_orderkey) AS k_and,
           bit_or(l_orderkey) AS k_or,
           bit_xor(l_orderkey) AS k_xor,
           CAST(bool_and(l_quantity > 1) AS INT) AS all_gt1,
           CAST(bool_or(l_quantity > 49) AS INT) AS any_gt49,
           CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_disc,
           CAST(median(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS med_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.bit_and("l_orderkey").alias("k_and"),
            F.bit_or("l_orderkey").alias("k_or"),
            F.bit_xor("l_orderkey").alias("k_xor"),
            F.bool_and(F.col("l_quantity") > 1).cast("int").alias("all_gt1"),
            F.bool_or(F.col("l_quantity") > 49).cast("int").alias("any_gt49"),
            F.count_if(F.col("l_discount") > 0.05).alias("n_disc"),
            F.median(F.col("l_quantity").cast("bigint")).cast("double").alias("med_qty"),
        )
        .orderBy("l_returnflag")
    )
)


# Second date/time tranche over events.ts — the time-of-day and
# year-position extractors date_funcs (orders dates) cannot exercise.
# minutes_since subtracts exact minute indexes: each side is
# epoch(date_trunc minute)/60, whose quotient is integral by construction
# (epochs of minute boundaries are divisible by 60), so trunc-vs-floor
# semantics cannot diverge even for events before the 2024 anchor
# (ADVICE r3: the old double-division + cast('long') truncated toward
# zero while the oracle floors).
register(
    "date_funcs2",
    """
    SELECT event_id,
           quarter(ts) AS qtr,
           week(ts) AS iso_week,
           dayofyear(ts) AS doy,
           hour(ts) AS hh,
           minute(ts) AS mi,
           second(ts) AS ss,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d,
           CAST(epoch(time_bucket(INTERVAL '1 minute', ts)) AS BIGINT) // 60
             - CAST(epoch(TIMESTAMP '2024-01-01 00:00:00') AS BIGINT) // 60
             AS minutes_since
    FROM events
    ORDER BY event_id
    """,
)(
    lambda spark, sf_dir: (
        # field extraction goes through the UTC wall clock (utc_ntz) and
        # minute indexes through pure epoch integer arithmetic, so every
        # output is identical under ANY driver session timezone — a bare
        # hour(ts)/cast(ts as date) extracts in the session zone and only
        # matched the naive-as-UTC oracle when the session happened to be
        # UTC (found by the Kathmandu/New_York sweep).
        t(spark, sf_dir, "events")
        .withColumn("__nt", utc_ntz("ts"))
        .select(
            "event_id",
            F.quarter("__nt").cast("long").alias("qtr"),
            F.weekofyear("__nt").cast("long").alias("iso_week"),
            F.dayofyear("__nt").cast("long").alias("doy"),
            F.hour("__nt").cast("long").alias("hh"),
            F.minute("__nt").cast("long").alias("mi"),
            F.second("__nt").cast("long").alias("ss"),
            F.date_format(F.to_date("__nt"), "yyyy-MM-dd").alias("d"),
            # epoch minute index difference: 2024-01-01T00:00Z = 1704067200s
            F.expr("unix_micros(ts) div 60000000 - 28401120").alias("minutes_since"),
        )
        .orderBy("event_id")
    )
)


# Second array tranche: set algebra on arrays, position/remove/slice/
# flatten/sequence/desc-sort. Set-op outputs are sorted then joined to
# scalar strings: Spark's array_union/intersect/except preserve
# first-occurrence order while DuckDB's list_distinct does not guarantee
# one, so ordering is normalized before comparison.
register(
    "array_funcs2",
    """
    WITH a AS (
      SELECT p_partkey,
             string_split(p_type, ' ') AS ty,
             string_split(p_name, ' ') AS nm
      FROM part
    )
    SELECT p_partkey,
           COALESCE(array_to_string(list_sort(list_distinct(list_cat(ty, nm))), ','), '') AS union_sorted,
           COALESCE(array_to_string(list_sort(list_distinct(list_intersect(ty, nm))), ','), '') AS intersect_sorted,
           COALESCE(array_to_string(list_sort(list_distinct(list_filter(ty, x -> NOT list_contains(nm, x)))), ','), '') AS except_sorted,
           CAST(coalesce(list_position(ty, 'PLATED'), 0) AS INT) AS plated_pos,
           COALESCE(array_to_string(list_filter(ty, x -> x <> 'STANDARD'), ','), '') AS no_std,
           COALESCE(array_to_string(flatten([ty, nm]), ','), '') AS flat,
           COALESCE(array_to_string(ty[2:len(ty)], ','), '') AS ty_tail,
           COALESCE(array_to_string(list_transform(range(1, CAST(len(ty) AS BIGINT) + 1),
                                          i -> CAST(i AS VARCHAR)), ','), '') AS idx_seq,
           COALESCE(array_to_string(list_sort(nm, 'DESC'), ','), '') AS nm_desc
    FROM a
    ORDER BY p_partkey
    """,
)(
    lambda spark, sf_dir: (
        t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.split("p_type", " ").alias("ty"),
            F.split("p_name", " ").alias("nm"),
        )
        .select(
            "p_partkey",
            F.array_join(F.sort_array(F.array_union("ty", "nm")), ",").alias(
                "union_sorted"
            ),
            F.array_join(F.sort_array(F.array_intersect("ty", "nm")), ",").alias(
                "intersect_sorted"
            ),
            F.array_join(F.sort_array(F.array_except("ty", "nm")), ",").alias(
                "except_sorted"
            ),
            F.array_position("ty", "PLATED").cast("int").alias("plated_pos"),
            F.array_join(F.array_remove("ty", "STANDARD"), ",").alias("no_std"),
            F.array_join(F.flatten(F.array("ty", "nm")), ",").alias("flat"),
            F.array_join(F.slice("ty", 2, F.size("ty") - 1), ",").alias("ty_tail"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.size("ty")), lambda i: i.cast("string")
                ),
                ",",
            ).alias("idx_seq"),
            F.array_join(F.sort_array("nm", asc=False), ",").alias("nm_desc"),
        )
        .orderBy("p_partkey")
    )
)
