"""Unit tests for functions/texts.py column expressions."""

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.functions import texts as X


def _top_count(spark, toks):
    df = spark.createDataFrame([(toks,)], "tk array<string>")
    return df.select(X.top_token_count(F.col("tk")).alias("c")).first().c


def test_top_token_count_mode(spark):
    assert _top_count(spark, ["a", "b", "a", "c", "a"]) == 3


def test_top_token_count_all_distinct(spark):
    assert _top_count(spark, ["x", "y", "z"]) == 1


def test_top_token_count_all_same(spark):
    assert _top_count(spark, ["q"] * 7) == 7


def test_top_token_count_unsorted_input(spark):
    # mode is order-independent: ties broken by count only
    assert _top_count(spark, ["b", "a", "b", "a", "b"]) == 3


def test_top_token_count_empty(spark):
    assert _top_count(spark, []) == 0
