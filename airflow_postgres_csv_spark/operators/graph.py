"""Connected components over similarity edges — dedup cluster formation.

Near-dup pipelines don't stop at pairs: (a,b) and (b,c) must collapse into
one cluster with one survivor, which is a connected-components problem over
the pair graph. The reference has no analog (extension surface,
SURVEY.md §2.3); semantics = transitive closure of the edge set, every node
labeled with the minimum id reachable from it — a canonical,
iteration-order-independent cluster id (which is what makes the result
oracle-checkable against a DuckDB recursive-CTE transitive closure).

Two implementations, same contract:

- ``connected_components`` (default) — alternating large-star / small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14). Each half-round is one equi-join + one groupBy over the edge
  list; the edge set converges to a union of stars (every member pointing
  at its component minimum) in **O(log n) rounds regardless of graph
  diameter** — a 100 TB near-dup chain of any length converges within the
  default budget, where per-hop propagation needs diameter rounds.
- ``connected_components_propagation`` — the min-label-propagation loop,
  kept as the independent cross-check (tests compare the two on random
  graphs). Rounds = graph diameter; raises beyond ``max_iter``.

Shared 100 TB design notes:
- All per-round work is DataFrame joins/groupBys (distributed); the driver
  loop only collects scalar convergence aggregates.
- ``localCheckpoint`` truncates lineage each round so the plan doesn't
  grow with iterations (the classic iterative-algorithm OOM trap).
- Both raise rather than returning an unconverged (garbage) labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bfs_hops",
    "connected_components",
    "connected_components_propagation",
    "kcore_nodes",
    "pagerank_integer",
    "triangle_counts",
]


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's closed-neighborhood min.

    Input/output: undirected edge list (u, v), each edge in one canonical
    orientation, no self-loops.
    """
    sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("_mv", F.col("u")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's smaller-neighbor star, rewire everything to the min."""
    # Direct each edge from the larger to the smaller endpoint.
    d = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    j = d.join(mins, "u")
    rewired = j.where(F.col("v") != F.col("m")).select(F.col("v").alias("u"), F.col("m").alias("v"))
    center = j.select(F.col("u"), F.col("m").alias("v")).distinct()
    return rewired.unionByName(center).where(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster assignment (``id_col``, ``cluster_id``) for every node.

    ``edges`` is an undirected pair list (each pair once, either order);
    ``nodes`` is the full node universe (isolated nodes come out as
    singleton clusters labeled with their own id). Alternating
    large-star/small-star: O(log n) rounds, so ``max_iter=25`` covers any
    physically storable graph. Raises if the fixpoint is not reached — a
    converged result is the correctness contract, not a best effort.
    """
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    # one count doubles as the emptiness probe AND the first round's
    # previous-cardinality (isEmpty would be a separate job)
    n_prev = e.count()
    converged = n_prev == 0
    if not converged:
        # Exact set equality per round: equal counts + one-sided
        # difference empty. The previous round's count is carried across
        # iterations instead of recounting the (checkpointed) edge set —
        # one fewer job per round; exceptAll only runs on count equality.
        # The checkpoint is LAZY and the count right after it is the
        # materializing action (a lazy localCheckpoint persists on its
        # first computation), so checkpoint + convergence probe cost ONE
        # job per round instead of two (guide §2.4); every later consumer
        # (next round's stars, exceptAll, the fixpoint star read) reads
        # the stored partitions.
        for _ in range(max_iter):
            e1 = _small_star(_large_star(e)).localCheckpoint(eager=False)
            n_cur = e1.count()
            converged = n_cur == n_prev and e1.exceptAll(e).isEmpty()
            e, n_prev = e1, n_cur
            if converged:
                break
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )

    # At the fixpoint the edge set is a union of stars (member -> root, with
    # member > root); roots and isolated nodes label themselves.
    member_root = e.select(
        F.greatest("u", "v").alias("n"), F.least("u", "v").alias("root")
    ).groupBy("n").agg(F.min("root").alias("root"))
    return (
        nodes.select(F.col(id_col).alias("n"))
        .join(member_root, "n", "left")
        .select(
            F.col("n").alias(id_col),
            F.coalesce("root", F.col("n")).alias("cluster_id"),
        )
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Per-node triangle participation counts → ``(node, n_triangles)``.

    Triangle counting is the workhorse of graph-shaped data quality checks
    (cohesion of co-occurrence graphs, clustering coefficients, community
    density). Implementation is the **degree-oriented** distributed
    algorithm: orient every edge from its lower ``(degree, id)`` endpoint
    to the higher one, enumerate directed wedges ``s→t1, s→t2`` with
    ``key(t1) < key(t2)``, and close each wedge against the oriented edge
    ``t1→t2``. Each triangle is produced exactly once, and the wedge count
    is bounded by Σ_s C(outdeg(s), 2) where every out-neighbor has degree
    ≥ deg(s) — the O(m^1.5) bound (Suri & Vassilvitskii, WWW'11) that a
    naive id-ordered join does NOT have: a hub node of degree d generates
    O(d²) id-ordered wedges but only O(m) degree-ordered ones, which is the
    difference between finishing and not finishing on a power-law graph at
    100 TB. All steps are equi-joins/groupBys (no driver loop, no
    collect); only nodes in ≥1 triangle appear in the output.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        # consumed by degree-count, wedge build (×2) and the closing join.
        # EAGER: with AQE the independent downstream shuffle stages are
        # submitted CONCURRENTLY, and a lazy checkpoint that none of them
        # has materialized yet makes each racing stage recompute the whole
        # upstream edge derivation (measured at sf0.1: duplicate 0.8 s /
        # 0.6 s job pairs in the profile). One eager job pins it once.
        .localCheckpoint(eager=True)
    )
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("a", "n")
    # Orient by total order (degree, id): strictly fewer out-edges from hubs.
    keyed = (
        sym.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
        .where(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
        )
        .select(
            F.col("a").alias("s"),
            F.col("b").alias("t"),
            F.col("db").alias("dt"),
        )
        # consumed 3× (both wedge sides + closing join) — EAGER for the
        # same AQE concurrent-stage reason as ``e`` above: lazy left the
        # three consumers racing to materialize it, each re-running the
        # degree joins.
        .localCheckpoint(eager=True)
    )
    w1 = keyed.select(F.col("s"), F.col("t").alias("t1"), F.col("dt").alias("d1"))
    w2 = keyed.select(F.col("s"), F.col("t").alias("t2"), F.col("dt").alias("d2"))
    wedges = w1.join(w2, "s").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("t1") < F.col("t2")))
    )
    closing = keyed.select(F.col("s").alias("t1"), F.col("t").alias("t2"))
    tri = wedges.join(closing, ["t1", "t2"]).select("s", "t1", "t2")
    return (
        tri.select(F.explode(F.array("s", "t1", "t2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def pagerank_integer(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    iters: int = 6,
    scale: int = 1 << 30,
    damping_num: int = 7,
    damping_den: int = 8,
    broadcast_max_nodes: int = 50_000_000,
) -> DataFrame:
    """Exact fixed-point PageRank → ``(node, rank_scaled)`` after ``iters`` rounds.

    Centrality over co-occurrence/link graphs ranks "hub" documents and
    entities for curation; the reference has no analog (extension surface).
    All arithmetic is **integer**: ranks start at ``scale``, each round
    computes ``r'(v) = scale·(1-d) + d · Σ_u (r(u) div outdeg(u))`` with
    dyadic damping ``d = damping_num/damping_den`` evaluated as
    ``(num·Σ) div den`` — integer division and order-independent integer
    sums, so the result is bit-identical regardless of partitioning and
    replayable by any engine (the oracle unrolls the same ``iters`` stages
    in SQL). Dangling mass (nodes with no out-edges) is dropped, the
    standard simplification when ranks are used ordinally.

    100 TB design: one equi-join + one groupBy per round (the same shuffle
    shape as one BFS step), the edge+outdeg table is materialized once and
    reused every round, and ``localCheckpoint`` truncates lineage so the
    plan stays O(1) across iterations. The driver loop is a fixed counter —
    no convergence ``collect`` is needed because the iteration count is the
    contract.
    """
    if scale % damping_den:
        raise ValueError("scale must be divisible by damping_den for exactness")
    base = scale * (damping_den - damping_num) // damping_den
    # Materialize the (possibly expensive) upstream edge derivation ONCE —
    # deg, de and nodes all branch from it, and without the checkpoint each
    # branch re-executes the caller's edge-building plan.
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("outdeg"))
    # (u, v, outdeg) is consumed every round: materialize once.
    de = e.join(deg, "u").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # The rank table is |nodes| rows of (long, long) — tiny relative to the
    # edge table in every real graph. Broadcasting it turns each round's
    # contribution join into a map-side broadcast-hash join (the big edge
    # table never shuffles; the only exchange per round is the groupBy on
    # the 8-byte destination key). Falls back to a shuffle join past the
    # threshold, where ranks no longer fit executor memory.
    n_nodes = nodes.count()
    bcast = n_nodes <= broadcast_max_nodes
    r = nodes.select("node", F.lit(scale).cast("long").alias("r"))
    for _ in range(iters):
        rk = r.withColumnRenamed("node", "u")
        sums = (
            de.join(F.broadcast(rk) if bcast else rk, "u")
            .select(F.col("v").alias("node"), F.expr("r div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        # LAZY checkpoint: still truncates the driver-side plan to O(1)
        # per round (Catalyst sees an RDD leaf), but materialization
        # happens inside the ONE final action instead of an eager job per
        # round — each round's table has exactly one consumer (the next
        # round's broadcast/join), so laziness never duplicates work,
        # and the fixed-iteration loop needs no per-round convergence
        # action (guide §2.4: remove per-iteration jobs outright).
        r = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_num} * coalesce(s, 0L)) div {damping_den}")
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return r.select("node", F.col("r").alias("rank_scaled"))


def connected_components_propagation(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """Min-label propagation baseline — O(graph diameter) rounds.

    Kept as the independent oracle cross-check for ``connected_components``;
    prefer the star algorithm for anything that might contain long chains.
    Convergence test: Σ labels is strictly decreasing until the fixpoint
    (labels only ever decrease), so comparing one DECIMAL(38,0) sum per
    round is an exact, overflow-safe stop condition.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("u"), F.col(id_col).alias("label"))
    # Lazy checkpoint: the convergence-sum collect right below is the
    # materializing action, so checkpoint + checksum cost ONE job per
    # round instead of two (guide §2.4); the next round's join then reads
    # the stored partitions.
    labels = labels.localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.select(F.col("u").alias("v"), "label"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        if cur_sum == prev_sum:
            return labels.select(F.col("u").alias(id_col), F.col("label").alias("cluster_id"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def kcore_nodes(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """``rounds``-round k-core peeling → ``(node, deg)`` for nodes still
    alive after the peel, with their degree inside the surviving subgraph.

    The k-core (maximal subgraph where every node has degree >= k) is the
    dense-cohesion filter of graph-shaped data quality work: in a near-dup
    or co-occurrence graph, core membership separates structural hubs from
    incidental pairings. Peeling is the textbook algorithm — repeatedly
    delete nodes of degree < k — and each round here is one hash-agg
    (degrees) + two semi-joins (drop edges touching deleted nodes), the
    same shuffle shape as one BFS step. ``rounds`` bounds the peel for a
    deterministic, engine-replayable contract; the true k-core is reached
    as soon as a round deletes nothing (on real graphs the peel depth is
    far below the node count — if exactness at any depth is needed,
    convergence can be detected with a scalar count per round at the cost
    of determinism of *work*, not of result).

    Input edges are undirected (one row per edge, either orientation);
    symmetrization, self-loop removal and dedup happen here. Lineage is
    truncated per round (``localCheckpoint``) so the plan stays O(1).
    """
    e0 = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    e = (
        e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # The lazy checkpoint + count fold materialization and the carried
    # cardinality into ONE job per round (guide §2.4). Edges only ever
    # get DELETED by the peel, so count equality <=> the round removed
    # nothing <=> the peel reached its fixpoint — every remaining round
    # would be a no-op on the same set, so breaking early returns the
    # bit-identical result of running all ``rounds`` rounds.
    n_prev = e.count()
    for _ in range(rounds):
        if n_prev == 0:
            break
        keep = (
            e.groupBy("u")
            .agg(F.count(F.lit(1)).alias("__d"))
            .where(F.col("__d") >= k)
            .select("u")
        )
        e = (
            e.join(keep, "u")
            .join(keep.select(F.col("u").alias("v")), "v")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        n_cur = e.count()
        if n_cur == n_prev:
            break  # fixpoint: the remaining rounds cannot change the set
        n_prev = n_cur
    return (
        e.groupBy("u")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("u").alias("node"), "deg")
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "u",
    dst: str = "v",
    source_col: str = "node",
    max_hops: int = 8,
    broadcast_max_frontier: int = 50_000_000,
) -> DataFrame:
    """Multi-source BFS → ``(node, hop)`` for every node within
    ``max_hops`` undirected hops of any source (hop = exact shortest-path
    length; sources themselves at hop 0; unreached nodes absent).

    Hop distance from a seed set is the remaining single-source-shortest-
    path primitive the graph kit lacked (components = reachability,
    pagerank = centrality, k-core = cohesion, triangles = clustering):
    "how far is every item from the curated seed set" drives expanding-
    frontier curation and recommendation distance. The reference has no
    analog (extension surface, SURVEY.md §2.3).

    Semantics are iteration-order independent (a node's BFS level is a
    property of the graph), so the result is oracle-checkable against a
    hop-bounded recursive-CTE closure with ``MIN(hop)`` per node.

    100 TB design: each round is ONE equi-join (frontier onto the
    symmetrized edge table, broadcast while the frontier is small — the
    common case — so the big edge table never reshuffles) + one distinct
    + one anti-join against the visited set; ``localCheckpoint``
    truncates lineage so the plan stays O(1) across rounds. The driver
    loop collects a single scalar per round (frontier size) to early-exit
    a converged search — same contract as connected_components'
    convergence collect. ``max_hops`` bounds work on any input, the
    standard guard for accidental giant-diameter graphs.
    """
    e0 = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    e = (
        e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = (
        sources.select(F.col(source_col).alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = frontier.select("node", F.lit(0).cast("int").alias("hop"))
    for hop in range(1, max_hops + 1):
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        fr = frontier.select(F.col("node").alias("u"))
        if n_frontier <= broadcast_max_frontier:
            fr = F.broadcast(fr)
        # expand one level: neighbours of the frontier not yet visited.
        # Both checkpoints are LAZY: the next loop iteration's
        # frontier.count() is the single materializing action for the new
        # frontier AND (through the anti-join) for the carried visited
        # set — one job per hop where the eager pair cost three
        # (guide §2.4).
        frontier = (
            e.join(fr, "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(
            frontier.select("node", F.lit(hop).cast("int").alias("hop"))
        ).localCheckpoint(eager=False)
    return visited
