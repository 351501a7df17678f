"""Unit tests for operators/chunking.py window arithmetic."""

import pytest

from airflow_postgres_csv_spark.operators.chunking import chunk_documents


def _chunks(spark, text, chunk_tokens=4, overlap=2):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        chunk_documents(df, chunk_tokens=chunk_tokens, overlap=overlap)
        .orderBy("chunk_idx")
        .collect()
    )
    return [(r.chunk_idx, r.chunk_text, r.n_tokens) for r in rows]


def test_short_doc_single_chunk(spark):
    assert _chunks(spark, "a b c") == [(0, "a b c", 3)]


def test_exact_window_single_chunk(spark):
    assert _chunks(spark, "a b c d") == [(0, "a b c d", 4)]


def test_overlapping_windows_cover_all_tokens(spark):
    # 7 tokens, window 4, stride 2 -> chunks at offsets 0, 2, 4 (last short)
    got = _chunks(spark, "a b c d e f g")
    assert got == [(0, "a b c d", 4), (1, "c d e f", 4), (2, "e f g", 3)]


def test_no_overlap(spark):
    got = _chunks(spark, "a b c d e", chunk_tokens=2, overlap=0)
    assert got == [(0, "a b", 2), (1, "c d", 2), (2, "e", 1)]


def test_bad_overlap_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=-1)
