"""In-suite differential-oracle spot check.

The full gate is ``python -m tools.verify_local`` over all registered
queries (~6 min); this test runs the same Spark-vs-DuckDB comparison for a
small cross-family sample at the smoke scale factor, so oracle drift (a
query edited without its SQL twin, a helper change that shifts values)
fails in the ordinary pytest run instead of waiting for a manual full
verification pass.
"""

from __future__ import annotations

from airflow_postgres_csv_spark.queries import registry
from tools.verify_local import compare, duck_con

SF = "/root/testdata/sf0.001"

# one per major family: agg, join, window, function surface, ETL roundtrip,
# dedup, similarity, text, events, sampling
SAMPLE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "window_topk_per_group",
    "string_funcs",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "similarity_topk_bruteforce",
    "text_tfidf_topk",
    "events_sessionization",
    "sample_weighted_hash",
]


def test_oracle_sample_matches(spark):
    reg = registry()
    con = duck_con(SF)
    failures = {}
    for name in SAMPLE:
        rq = reg[name]
        sdf = rq.fn(spark, SF)
        spark_cols = sdf.columns
        spark_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(rq.oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        problems = compare(name, spark_cols, spark_rows, duck_cols, duck_rows)
        if problems:
            failures[name] = problems
    assert failures == {}, failures
