"""In-suite differential-oracle spot check.

The full gate is ``python -m tools.verify_local`` over all registered
queries; this test runs the same driver-faithful pandas comparison
(``toPandas`` vs DuckDB ``.df()``, canonical sort, hash_pandas_object) for
a small cross-family sample at the smoke scale factor, so oracle drift (a
query edited without its SQL twin, a helper change that shifts values, a
dtype skew the old value-level comparison hid) fails in the ordinary
pytest run instead of waiting for a manual full verification pass.
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
        spark_pdf = rq.fn(spark, SF).toPandas()
        duck_pdf = con.execute(rq.oracle).df()
        problems = compare(spark_pdf, duck_pdf)
        if problems:
            failures[name] = problems
    assert failures == {}, failures


def test_no_driver_breaking_oracle_types():
    """No oracle may emit HUGEINT/UHUGEINT (pandas reads them as float64
    while Spark sends int64 → driver hash mismatch, round-4 verdict) or
    LIST/STRUCT/MAP output columns (the driver's pandas sort_values raises
    ``unhashable type`` → automatic ERR row). Typing only — no data scan."""
    import duckdb

    from airflow_postgres_csv_spark.catalog import TABLES
    from tools.oracle_types import bad_columns

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SF}/{tbl}.parquet')"
        )
    offenders = {}
    for name, rq in registry().items():
        if rq.oracle is None:
            continue
        bad = bad_columns(con, rq.oracle)
        if bad:
            offenders[name] = bad
    assert offenders == {}, offenders
