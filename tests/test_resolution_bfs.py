"""Unit tests: BFS hop distance + entity-resolution pipeline."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.graph import bfs_hops
from airflow_postgres_csv_spark.operators.resolution import (
    blocked_candidate_pairs,
    resolve_entities,
)


def _hops(spark, edges, sources, **kw):
    e = spark.createDataFrame(edges, "u bigint, v bigint")
    s = spark.createDataFrame([(x,) for x in sources], "node bigint")
    return {r.node: r.hop for r in bfs_hops(e, s, **kw).collect()}


def _brute_bfs(edges, sources, max_hops):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in sources}
    frontier = set(sources)
    for h in range(1, max_hops + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = h
                    nxt.add(m)
        frontier = nxt
    return dist


def test_bfs_chain_levels(spark):
    """Exact levels along a chain; nodes past max_hops absent."""
    got = _hops(spark, [(i, i + 1) for i in range(6)], [0], max_hops=3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_multi_source_min(spark):
    """Two seeds: each node gets the distance to the NEAREST seed."""
    got = _hops(spark, [(i, i + 1) for i in range(6)], [0, 6], max_hops=3)
    assert got == {0: 0, 6: 0, 1: 1, 5: 1, 2: 2, 4: 2, 3: 3}


def test_bfs_early_exit_and_orientation(spark):
    """Search stops when the frontier drains (component exhausted before
    max_hops); edge orientation is irrelevant."""
    got = _hops(spark, [(2, 1), (3, 2), (10, 11)], [1], max_hops=8)
    assert got == {1: 0, 2: 1, 3: 2}


def test_bfs_matches_bruteforce_property(spark):
    rng = random.Random(7)
    nodes = list(range(40))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(70)
    ]
    sources = [0, 13]
    got = _hops(spark, edges, sources, max_hops=5)
    want = _brute_bfs(edges, sources, 5)
    assert got == want


def _people(spark, rows):
    return spark.createDataFrame(rows, "pid bigint, name string")


def test_er_blocking_bounds_candidates(spark):
    """A pair outside every block is never even verified, however close
    the names are — the recall contract of blocking is explicit."""
    df = _people(spark, [(1, "aaab"), (2, "aaac"), (3, "zaab")])
    pairs = blocked_candidate_pairs(
        df, "pid", "name", [F.substring("name", 1, 2)], max_dist=1
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}  # 3 blocked away


def test_er_multi_pass_union_recovers_and_dedupes(spark):
    """A second blocking key recovers the cross-block pair; a pair found
    by both passes is emitted once."""
    df = _people(spark, [(1, "aaab"), (2, "aaac"), (3, "zaab")])
    pairs = blocked_candidate_pairs(
        df,
        "pid",
        "name",
        [F.substring("name", 1, 2), F.expr("right(name, 2)")],
        max_dist=1,
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2), (1, 3)}
    assert len(pairs) == 2


def test_er_resolve_clusters_and_survivors(spark):
    """Transitive closure merges chains across blocks; survivor = min id;
    unmatched records come out as singleton survivors."""
    df = _people(
        spark,
        [(1, "smith"), (2, "smitt"), (3, "smita"), (9, "jones")],
    )
    out = resolve_entities(
        df, "pid", "name", [F.substring("name", 1, 4)], max_dist=1
    ).collect()
    got = {r.pid: (r.cluster_id, r.cluster_size, r.is_survivor) for r in out}
    # smith~smitt (dist 1), smitt~smita? dist(smitt,smita)=2 -> only via
    # smith~smita dist 1: chain closes all three into cluster 1
    assert got[1] == (1, 3, True)
    assert got[2] == (1, 3, False)
    assert got[3] == (1, 3, False)
    assert got[9] == (9, 1, True)
