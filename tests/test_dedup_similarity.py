"""Invariant tests for the non-oracle-checkable ops (SimHash, LSH ANN) and
sanity checks for the dedup operator family at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.catalog import load
from airflow_postgres_csv_spark.operators import dedup as D
from airflow_postgres_csv_spark.operators import similarity as S


def test_minhash_candidates_superset_of_high_jaccard(spark, sf_dir):
    """Every truly-near pair (jaccard >= 0.8) must be found by MinHash+LSH
    with these band parameters (P(detect) ~ 1 - (1-j^2)^4 > 0.99)."""
    docs = load(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    mh = {
        (r.id_a, r.id_b)
        for r in D.minhash_near_dup_pairs(docs, threshold=0.8).collect()
    }
    assert exact, "fixture should contain planted near-duplicates"
    assert exact == mh


def test_simhash_flags_near_duplicates(spark, sf_dir):
    """Planted near-dups (jaccard >= 0.9) should sit within small Hamming
    distance; SimHash pairs must be symmetric-unique and verified."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    seen = set()
    for r in pairs:
        assert r.id_a < r.id_b
        assert (r.id_a, r.id_b) not in seen
        seen.add((r.id_a, r.id_b))
        assert r.hamming <= 3
    near = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    # high-jaccard planted dups should overlap strongly with simhash pairs
    if near:
        assert len(near & seen) / len(near) >= 0.5


def test_simhash_bits_shape(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(20)
    sh = D.simhash_bits(docs).collect()
    assert all(len(r.bits) == 64 for r in sh)
    assert all(0 <= r.bank_0 < 2**16 for r in sh)


def test_lsh_ann_recall_floor(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = S.topk_cosine_bruteforce(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    ann = S.lsh_bucket_topk(emb, queries, k=5, n_planes=4, n_tables=8)
    hits = exact.join(
        ann.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    ).count()
    assert hits / exact.count() >= 0.5


def test_topk_excludes_self_and_is_ranked(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    out = S.topk_cosine_bruteforce(emb, emb.filter(F.col("vec_id") < 3), k=4).collect()
    by_q: dict[int, list] = {}
    for r in out:
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        cos = [r.cosine for r in rows]
        assert cos == sorted(cos, reverse=True)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_partial_topk_matches_plain(spark, sf_dir):
    """Map-side local top-k pre-reduction must be lossless: identical
    (query, neighbor, rank) results as the plain global window."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    plain = S.topk_cosine_bruteforce(emb, queries, k=5, partial_topk=False)
    reduced = S.topk_cosine_bruteforce(emb, queries, k=5, partial_topk=True)
    key = lambda r: (r.query_id, r.rank, r.neighbor_id)
    assert sorted(map(key, plain.collect())) == sorted(map(key, reduced.collect()))


def test_ivf_recall_and_cell_locality(spark, sf_dir):
    """IVF probing must beat the recall floor, and probing ALL cells must
    recover exact top-k (the degenerate-correctness property)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cents = S.ivf_centroids(emb, n_cells=8)
    exact = S.topk_cosine_bruteforce(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    ann = S.ivf_topk(emb, queries, k=5, n_cells=8, n_probe=4, centroids=cents)
    hits = exact.join(
        ann.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    ).count()
    assert hits / exact.count() >= 0.4
    full = S.ivf_topk(emb, queries, k=5, n_cells=8, n_probe=8, centroids=cents)
    assert sorted(map(tuple, full.select("query_id", "neighbor_id").collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_embed_real_path_is_gated(spark, sf_dir):
    from airflow_postgres_csv_spark.operators import embedding as E

    docs = load(spark, sf_dir, "documents").limit(1)
    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        E.embed_texts_real(docs)
    # fake path: deterministic, unit-norm-free but bounded features
    row = E.embed_texts(docs, dim=8).select("embedding").first()
    assert len(row.embedding) == 8
    assert all(0.0 <= v <= 1.0 for v in row.embedding)
