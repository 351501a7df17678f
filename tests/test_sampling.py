"""Unit tests for operators/sampling.py determinism and quota semantics."""

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.sampling import (
    sample_stratified_quota,
    split_train_test,
)


def _docs(spark, n=50):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )


def test_quota_exact_per_stratum(spark):
    out = sample_stratified_quota(_docs(spark), "lang", 5, "doc_id")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 5, "1": 5, "2": 5}


def test_quota_caps_at_stratum_size(spark):
    out = sample_stratified_quota(_docs(spark, 6), "lang", 10, "doc_id")
    assert out.count() == 6  # every stratum smaller than quota -> all rows


def test_sample_is_deterministic(spark):
    a = sorted(r.doc_id for r in sample_stratified_quota(_docs(spark), "lang", 5, "doc_id").collect())
    b = sorted(
        r.doc_id
        for r in sample_stratified_quota(
            _docs(spark).repartition(7), "lang", 5, "doc_id"
        ).collect()
    )
    assert a == b


def test_prefilter_preserves_selection(spark):
    # '8' keeps ~half the hash space; quotas small enough to survive it
    full = sorted(r.doc_id for r in sample_stratified_quota(_docs(spark, 200), "lang", 3, "doc_id").collect())
    thin = sorted(
        r.doc_id
        for r in sample_stratified_quota(
            _docs(spark, 200), "lang", 3, "doc_id", prefilter_hex="8"
        ).collect()
    )
    assert full == thin


def test_split_partitions_all_rows(spark):
    out = split_train_test(_docs(spark, 300), "doc_id")
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 300
    assert set(counts) <= {"train", "test"} and counts["train"] > counts.get("test", 0)


def test_split_deterministic_across_runs(spark):
    df = _docs(spark, 300)
    a = {(r.doc_id, r.split) for r in split_train_test(df, "doc_id").collect()}
    b = {(r.doc_id, r.split) for r in split_train_test(df.repartition(5), "doc_id").collect()}
    assert a == b
