"""Unit tests for operators/packing.py greedy semantics."""

import pytest

from airflow_postgres_csv_spark.operators.packing import pack_sequences


def _pack(spark, tokens, budget):
    rows = [("g", i, n) for i, n in enumerate(tokens)]
    df = spark.createDataFrame(rows, "grp string, idx long, n_tokens int")
    out = (
        pack_sequences(df, "grp", ["idx"], "n_tokens", budget)
        .orderBy("idx")
        .collect()
    )
    return [(r.seq_id, r.seq_offset) for r in out]


def test_exact_fit_then_new_sequence(spark):
    assert _pack(spark, [100, 100, 56, 100], 256) == [
        (0, 0),
        (0, 100),
        (0, 200),
        (1, 0),
    ]


def test_overflow_opens_new_sequence(spark):
    assert _pack(spark, [200, 100, 100], 256) == [(0, 0), (1, 0), (1, 100)]


def test_oversized_chunk_alone(spark):
    # a chunk larger than the budget occupies its own sequence
    assert _pack(spark, [300, 10, 300], 256) == [(0, 0), (1, 0), (2, 0)]


def test_groups_pack_independently(spark):
    df = spark.createDataFrame(
        [("a", 0, 200), ("b", 0, 200), ("a", 1, 100), ("b", 1, 100)],
        "grp string, idx long, n_tokens int",
    )
    out = pack_sequences(df, "grp", ["idx"], "n_tokens", 256).collect()
    by = {(r.grp, r.idx): (r.seq_id, r.seq_offset) for r in out}
    assert by[("a", 0)] == (0, 0) and by[("a", 1)] == (1, 0)
    assert by[("b", 0)] == (0, 0) and by[("b", 1)] == (1, 0)


def test_bad_budget_raises(spark):
    df = spark.createDataFrame([("g", 0, 1)], "grp string, idx long, n_tokens int")
    with pytest.raises(ValueError):
        pack_sequences(df, "grp", ["idx"], "n_tokens", 0)
