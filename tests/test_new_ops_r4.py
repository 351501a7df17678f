"""Unit tests for the round-4 additions: z-order layout, integer PageRank,
prefix-filter Jaccard, and priority sampling — each checked against an
independent pure-Python replay on small inputs."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.dedup import (
    jaccard_prefix_pairs,
    ngram_jaccard_pairs,
)
from airflow_postgres_csv_spark.operators.graph import pagerank_integer
from airflow_postgres_csv_spark.operators.layout import zorder_extents, zorder_value
from airflow_postgres_csv_spark.operators.sampling import sample_priority_topk


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_value_matches_python_morton(spark):
    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 1), (4095, 4095), (17, 4094)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_value(F.col("x"), F.col("y"), bits=12).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton(x, y, 12), (x, y)


def test_zorder_extents_buckets_and_counts(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "a: long, b: long")
    out = {
        r.bucket: r
        for r in zorder_extents(df, "a", "b", bits=6, bucket_bits=2).collect()
    }
    # replay: bucket = morton >> (2*6 - 2)
    import collections

    exp = collections.defaultdict(list)
    for x, y in rows:
        exp[_morton(x, y, 6) >> 10].append((x, y))
    assert set(out) == set(exp)
    for b, pts in exp.items():
        assert out[b].n == len(pts)
        assert out[b].min_x == min(p[0] for p in pts)
        assert out[b].max_y == max(p[1] for p in pts)


def _pagerank_py(edges, iters, scale):
    from collections import defaultdict

    out = defaultdict(set)
    for u, v in edges:
        if u != v:
            out[u].add(v)
    nodes = set(out) | {v for vs in out.values() for v in vs}
    r = {n: scale for n in nodes}
    base = scale // 8
    for _ in range(iters):
        s = defaultdict(int)
        for u, vs in out.items():
            c = r[u] // len(vs)
            for v in vs:
                s[v] += c
        r = {n: base + (7 * s[n]) // 8 for n in nodes}
    return r


def test_pagerank_integer_matches_python_replay(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1), (1, 4), (3, 4), (5, 1)]
    df = spark.createDataFrame(edges, "u: long, v: long")
    got = {
        r.node: r.rank_scaled
        for r in pagerank_integer(df, iters=5, scale=1 << 20).collect()
    }
    assert got == _pagerank_py(edges, 5, 1 << 20)


def test_pagerank_scale_divisibility_guard(spark):
    df = spark.createDataFrame([(1, 2)], "u: long, v: long")
    with pytest.raises(ValueError, match="divisible"):
        pagerank_integer(df, scale=1001, damping_den=8)


def test_jaccard_prefix_matches_plain_join(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy cat today"),
        (3, "a completely different document about spark engines"),
        (4, "a completely different document about spark engines"),
        (5, "the quick brown fox jumps over the lazy dog today"),
        (6, "spark engines process a completely different document"),
    ]
    df = spark.createDataFrame(texts, "doc_id: long, text: string")
    plain = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(df, threshold=0.4).collect()
    }
    pref = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in jaccard_prefix_pairs(df, threshold=0.4).collect()
    }
    assert plain == pref
    assert (1, 5) in pref and pref[(1, 5)] == 1.0


def test_priority_topk_deterministic_and_exact(spark):
    rows = [(f"d{i}", (i * 37) % 50 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id: string, w: long")
    got = [
        (r.doc_id, r.priority)
        for r in sample_priority_topk(df, "w", k=10, key_col="doc_id").collect()
    ]
    # python replay of the integer priority
    def prio(doc_id, w):
        h = int(hashlib.md5(f"{doc_id}:prio".encode()).hexdigest()[:8], 16)
        return (w << 32) // (h + 1)

    exp = sorted(
        ((d, prio(d, w)) for d, w in rows), key=lambda t: (-t[1], t[0])
    )[:10]
    assert got == exp


def test_priority_topk_rejects_fractional_weights(spark):
    df = spark.createDataFrame([("a", 0.7)], "doc_id: string, w: double")
    with pytest.raises(ValueError, match="integral"):
        sample_priority_topk(df, "w", k=1)
