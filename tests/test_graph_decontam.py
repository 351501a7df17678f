"""Unit tests: connected components (dedup clustering) + decontamination."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from airflow_postgres_csv_spark.operators.decontam import contaminated_docs
from airflow_postgres_csv_spark.operators.graph import (
    connected_components,
    connected_components_propagation,
)


def _assign(spark, edges, nodes, **kw):
    e = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    n = spark.createDataFrame([(x,) for x in nodes], "id bigint")
    out = connected_components(e, n, **kw)
    return {r.id: r.cluster_id for r in out.collect()}


def test_cc_chain_and_singleton(spark):
    """A 4-node chain collapses to min-id; isolated node stays itself.
    Chains are the worst case for per-hop propagation (diameter rounds)."""
    got = _assign(spark, [(1, 2), (2, 3), (3, 4), (10, 11)], [1, 2, 3, 4, 7, 10, 11])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 10: 10, 11: 10}


def test_cc_edge_order_invariant(spark):
    """Pairs may arrive in either orientation; closure is the same."""
    a = _assign(spark, [(5, 2), (2, 9)], [2, 5, 9])
    b = _assign(spark, [(9, 2), (2, 5)], [2, 5, 9])
    assert a == b == {2: 2, 5: 2, 9: 2}


def test_cc_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _assign(spark, [(i, i + 1) for i in range(1, 12)], list(range(1, 13)), max_iter=2)


@pytest.mark.slow
def test_cc_long_chain_converges_in_log_rounds(spark):
    """A 60-deep path graph: diameter 60 > 25, so per-hop propagation
    exhausts its round budget, while the large-star/small-star default
    converges in O(log n) rounds (VERDICT r3 'Next round' #3)."""
    edges = [(i, i + 1) for i in range(60)]
    nodes = list(range(61))
    got = _assign(spark, edges, nodes)  # default max_iter=25
    assert got == {i: 0 for i in nodes}

    e = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    n = spark.createDataFrame([(x,) for x in nodes], "id bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_propagation(e, n).collect()


def test_cc_star_matches_propagation_on_random_graphs(spark):
    """The two algorithms are independent derivations of the same closure;
    they must agree exactly on random sparse graphs (incl. cliques,
    isolated nodes, and multi-component mixes)."""
    import random

    rng = random.Random(404)
    nodes = list(range(80))
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    e = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    n = spark.createDataFrame([(x,) for x in nodes], "id bigint")
    star = {r.id: r.cluster_id for r in connected_components(e, n).collect()}
    prop = {r.id: r.cluster_id for r in connected_components_propagation(e, n).collect()}
    assert star == prop


def test_contaminated_docs_flags_exact_overlap(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=2, text="totally different words here everywhere now"),
            Row(doc_id=3, text="alpha beta gamma delta epsilon zeta extra tail"),
        ]
    )
    bench = spark.createDataFrame(
        [Row(doc_id=99, text="prefix alpha beta gamma delta epsilon zeta")]
    )
    got = {r.doc_id: r.n_overlap for r in contaminated_docs(docs, bench, n=5).collect()}
    # doc 1: shingles of a 6-token text at n=5 -> 2, both present in bench
    # doc 3 shares the same leading 5-grams; doc 2 shares nothing
    assert got[1] == 2 and got[3] >= 1 and 2 not in got


def test_contaminated_docs_short_docs_never_match(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="too short")])
    bench = spark.createDataFrame([Row(doc_id=9, text="too short as well yes")])
    assert contaminated_docs(docs, bench, n=5).count() == 0


# --- triangle counting -----------------------------------------------------


def _tri(spark, edges):
    e = spark.createDataFrame(edges, "u bigint, v bigint")
    from airflow_postgres_csv_spark.operators.graph import triangle_counts

    return {r.node: r.n_triangles for r in triangle_counts(e).collect()}


def test_triangles_basic(spark):
    """K4 has 4 triangles; every node sits in C(3,2)=3 of them."""
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    assert _tri(spark, k4) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_none_and_duplicates(spark):
    """A path has no triangles; duplicate/reversed edges don't inflate."""
    assert _tri(spark, [(1, 2), (2, 3), (3, 4)]) == {}
    got = _tri(spark, [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (1, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_hub(spark):
    """A star (hub + leaves) has no triangles; adding one leaf-leaf edge
    makes exactly one — the degree-oriented wedge join must not
    double-count through the hub."""
    star = [(100, i) for i in range(1, 8)]
    assert _tri(spark, star) == {}
    assert _tri(spark, star + [(1, 2)]) == {100: 1, 1: 1, 2: 1}


# --- skyline ---------------------------------------------------------------


def _sky(spark, pts):
    from airflow_postgres_csv_spark.operators.skyline import skyline_max_min

    df = spark.createDataFrame(pts, "id bigint, x bigint, y bigint")
    out = skyline_max_min(df, "x", "y", tiebreak="id")
    return sorted(r.id for r in out.collect())


def test_skyline_basic(spark):
    """max x, min y: (5,1) and (9,4) survive; (3,2) is dominated by (5,1),
    (9,9) by (9,4)."""
    pts = [(1, 5, 1), (2, 3, 2), (3, 9, 4), (4, 9, 9), (5, 1, 7)]
    assert _sky(spark, pts) == [1, 3]


def test_skyline_ties_kept(spark):
    """Exact duplicates on both dims dominate nobody strictly: both stay."""
    pts = [(1, 5, 1), (2, 5, 1), (3, 4, 3)]
    assert _sky(spark, pts) == [1, 2]


def test_skyline_matches_quadratic(spark):
    """Two-phase result == brute-force dominance filter on a random set."""
    import random

    rng = random.Random(7)
    pts = [(i, rng.randrange(20), rng.randrange(20)) for i in range(80)]
    brute = sorted(
        i
        for i, x, y in pts
        if not any(
            (px >= x and py <= y) and (px > x or py < y) for _, px, py in pts
        )
    )
    assert _sky(spark, pts) == brute


def test_kcore_peels_tail_keeps_clique(spark):
    from airflow_postgres_csv_spark.operators.graph import kcore_nodes

    # 4-clique {1,2,3,4} with a pendant path 4-5-6: the 3-core is exactly
    # the clique (every clique node has degree 3 inside it); the path
    # peels away over two rounds (6 first, then 5).
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.deg for r in kcore_nodes(df, k=3, rounds=4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    # k=1 with zero rounds is just the symmetric degree table
    got0 = {r.node: r.deg for r in kcore_nodes(df, k=1, rounds=0).collect()}
    assert got0[4] == 4 and got0[6] == 1


def test_kcore_matches_bruteforce_property(spark):
    from hypothesis import HealthCheck, given, settings, strategies as st

    from airflow_postgres_csv_spark.operators.graph import kcore_nodes

    edge = st.tuples(
        st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)
    )

    def peel(edges, k):
        adj = {}
        for u, v in edges:
            if u == v:
                continue
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        changed = True
        while changed:
            changed = False
            for n in [n for n, nb in adj.items() if len(nb) < k]:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
        return {n: len(nb) for n, nb in adj.items()}

    @given(edges=st.lists(edge, max_size=20))
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(edges):
        df = (
            spark.createDataFrame(edges, "u long, v long")
            if edges
            else spark.createDataFrame([], "u long, v long")
        )
        # 10 rounds always converges on <=10 nodes
        got = {r.node: r.deg for r in kcore_nodes(df, k=2, rounds=10).collect()}
        assert got == peel(edges, 2)

    check()
