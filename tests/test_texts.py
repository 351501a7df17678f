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


def test_text_index_delete_matches_rebuild_exactly(spark, tmp_path):
    """GDPR delete from the persisted index: one MOR tombstone + exact
    stat decrement — searches afterwards are BIT-IDENTICAL to an index
    rebuilt without the documents (exact integer stats make avgdl equal),
    and zero posting files were rewritten."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_versions,
    )
    from airflow_postgres_csv_spark.operators.text_index import (
        text_index_build,
        text_index_delete,
        text_index_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "join stream filter join"),
            (2, "stream stream of data join"),
            (3, "filter the noise out"),
            (4, "join the stream now"),
            (5, "filter and join and stream"),
        ],
        "doc_id long, text string",
    )
    root = str(tmp_path / "idx")
    m1 = text_index_build(docs, root)
    m2 = text_index_delete(spark, root, [2, 4])
    # MOR: same posting files, one tombstone, stats decremented exactly
    assert m2["files"] == m1["files"]
    assert len(m2["tombstones"]) == 1
    assert m2["text_index"]["n_docs"] == 3
    assert m2["text_index"]["sum_dl"] == m1["text_index"]["sum_dl"] - 5 - 4
    got = [
        (r.doc_id, r.n_terms, r.bm25)
        for r in text_index_search(spark, root, ["join", "stream"], k=5).collect()
    ]
    assert all(d not in (2, 4) for d, _, _ in got)
    # bit-identical to a from-scratch index over the surviving docs
    rebuilt = str(tmp_path / "rebuilt")
    text_index_build(docs.where(~F.col("doc_id").isin(2, 4)), rebuilt)
    want = [
        (r.doc_id, r.n_terms, r.bm25)
        for r in text_index_search(
            spark, rebuilt, ["join", "stream"], k=5
        ).collect()
    ]
    assert got == want
    # re-adding a deleted id: the tombstone is commit-scoped — new
    # postings survive, stats re-increment (MVCC re-insert semantics)
    from airflow_postgres_csv_spark.operators.text_index import (
        text_index_append,
    )

    text_index_append(
        spark.createDataFrame([(2, "join stream again")], "doc_id long, text string"),
        root,
    )
    m3 = _load_manifest(root, snapshot_versions(root)[-1])
    assert m3["text_index"]["n_docs"] == 4
    got2 = {r.doc_id for r in text_index_search(spark, root, ["join"], k=5).collect()}
    assert 2 in got2
    with pytest.raises(ValueError, match="non-empty ints"):
        text_index_delete(spark, root, ["1; DROP"])


def test_text_index_phrase_search_positions(spark, tmp_path, monkeypatch):
    """Positional index (positions=True): exact phrase counting by
    position-list intersection, correct across multi-occurrence docs,
    APPENDS that inherit the positional flag, and MOR document deletion;
    non-positional indexes refuse phrase queries; serving tokenizes
    NOTHING but the query phrase itself."""
    from airflow_postgres_csv_spark.operators.text_index import (
        text_index_build,
        text_index_append,
        text_index_delete,
        text_index_phrase_search,
        text_index_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "a cat sat  ON the mat and the cat sat on a hat"),
            (3, "no match here cat alone sat nowhere on nothing"),
        ],
        "doc_id long, text string",
    )
    root = str(tmp_path / "pos")
    m = text_index_build(docs, root, positions=True)
    assert m["text_index"]["positions"] is True

    got = [
        (r.doc_id, r.n_occurrences, r.rk)
        for r in text_index_phrase_search(spark, root, "cat SAT on").collect()
    ]
    assert got == [(2, 2, 1), (1, 1, 2)]
    # single-term phrase degenerates to tf
    got1 = {
        r.doc_id: r.n_occurrences
        for r in text_index_phrase_search(spark, root, "the").collect()
    }
    assert got1 == {1: 2, 2: 2}

    # append inherits the positional flag; phrase search covers both
    text_index_append(
        spark.createDataFrame(
            [(9, "cat sat on cat sat on cat sat on")],
            "doc_id long, text string",
        ),
        root,
    )
    got = [
        (r.doc_id, r.n_occurrences)
        for r in text_index_phrase_search(spark, root, "cat sat on").collect()
    ]
    assert got == [(9, 3), (2, 2), (1, 1)]
    # MOR delete drops the doc from phrase results, flag preserved
    d = text_index_delete(spark, root, [2])
    assert d["text_index"]["positions"] is True
    got = [
        (r.doc_id, r.n_occurrences)
        for r in text_index_phrase_search(spark, root, "cat sat on").collect()
    ]
    assert got == [(9, 3), (1, 1)]
    # BM25 search still serves the positional index
    assert text_index_search(spark, root, ["cat"], k=5).count() == 3

    # a non-positional index refuses phrase queries
    root2 = str(tmp_path / "plain")
    text_index_build(docs, root2)
    with pytest.raises(ValueError, match="positional"):
        text_index_phrase_search(spark, root2, "cat sat")
    with pytest.raises(ValueError, match="empty phrase"):
        text_index_phrase_search(spark, root, "   ")
