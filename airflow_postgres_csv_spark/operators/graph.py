"""Connected components over similarity edges — dedup cluster formation.

Near-dup pipelines don't stop at pairs: (a,b) and (b,c) must collapse into
one cluster with one survivor, which is a connected-components problem over
the pair graph. The reference has no analog (extension surface,
SURVEY.md §2.3); semantics = transitive closure of the edge set.

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round replaces a node's label with the minimum label in
its closed neighborhood; at the fixpoint every node carries the minimum id
reachable from it — a canonical, iteration-order-independent cluster id
(which is what makes the result oracle-checkable against a DuckDB
recursive-CTE transitive closure).

100 TB design notes:
- Each round is one shuffle join (symmetric edges ⋈ labels) + one groupBy
  — all DataFrame ops, executed distributed; the driver loop only checks
  a 1-row convergence aggregate per round.
- Rounds needed = graph diameter. Near-dup graphs are unions of small
  dense cliques (diameter ~2-4); for adversarial long-chain graphs switch
  to the large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond") — same join primitive, O(log n)
  rounds.
- ``localCheckpoint`` truncates lineage each round so the plan doesn't
  grow with iterations (the classic iterative-algorithm OOM trap).
- Convergence test: Σ labels is strictly decreasing until the fixpoint
  (labels only ever decrease), so comparing one DECIMAL(38,0) sum per
  round is an exact, overflow-safe stop condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


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
    singleton clusters labeled with their own id). Raises if the fixpoint
    is not reached within ``max_iter`` rounds — a converged result is the
    correctness contract, not a best effort.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("u"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint(eager=True)
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
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        if cur_sum == prev_sum:
            return labels.select(F.col("u").alias(id_col), F.col("label").alias("cluster_id"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
