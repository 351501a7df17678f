"""Unit tests for functions/texts.py column expressions."""

import pytest
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


def test_text_index_serves_without_tokenizing(spark, tmp_path, monkeypatch):
    """The persisted BM25 index is build-once/serve-many: the search path
    never tokenizes (tokenizer monkeypatched to raise after build), reads
    only term-pruned posting files (Bloom + zone maps), and a search
    pinned to version 1 survives an index rebuild."""
    from airflow_postgres_csv_spark.operators import text_index as TI
    from airflow_postgres_csv_spark.operators.text_index import (
        text_index_build,
        text_index_plan,
        text_index_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "join stream filter join"),
            (2, "stream stream of data"),
            (3, "filter the noise out"),
            (4, "completely unrelated words here"),
            (5, "join me for a stream"),
        ],
        "doc_id long, text string",
    )
    root = str(tmp_path / "idx")
    m = text_index_build(docs, root)
    assert m["text_index"]["n_docs"] == 5
    assert m["version"] == 1

    def boom(*a, **kw):
        raise AssertionError("tokenizer ran on the serve path")

    monkeypatch.setattr(TI.X, "tokens", boom)
    got = text_index_search(spark, root, ["join", "stream"], k=3).collect()
    assert [r.doc_id for r in got] and got[0].rk == 1
    by_doc = {r.doc_id: r.n_terms for r in got}
    assert by_doc[1] == 2 and by_doc[5] == 2  # both terms hit docs 1 and 5
    assert 4 not in by_doc and 3 not in by_doc
    # ranking is deterministic and score-ordered
    scores = [r.bm25 for r in got]
    assert scores == sorted(scores, reverse=True)
    # wrong-kind guard
    with pytest.raises(ValueError, match="not a text index"):
        from airflow_postgres_csv_spark.operators.snapshots import (
            snapshot_commit,
        )

        other = str(tmp_path / "plain")
        snapshot_commit(docs, other)
        text_index_search(spark, other, ["join"])
    monkeypatch.undo()

    # pruning: a term absent from the corpus keeps no files (Bloom)
    plan_missing = text_index_plan(root, ["zzzznotaterm"])
    assert plan_missing["kept"] == [] and plan_missing["skipped"] == m["n_files"]
    # rebuild = new generation; a pinned search still serves v1
    text_index_build(docs.where(F.col("doc_id") <= 2), root)
    pinned = text_index_search(spark, root, ["join", "stream"], k=3, version=1)
    assert sorted(r.doc_id for r in pinned.collect()) == sorted(by_doc)
