"""Entity resolution: multi-pass blocking → bounded-edit-distance verify →
transitive closure → canonical survivor.

The classic record-linkage pipeline (Fellegi–Sunter matching reduced to
its deterministic core): generate candidate pairs ONLY inside blocks (a
record never meets more than its blockmates, so the all-pairs O(n²) never
materializes), verify candidates with a cheap string distance, close the
verified match graph into entity clusters, and elect one canonical
survivor per entity. The reference has no analog (extension surface,
SURVEY.md §2.3); this is the customer/vendor-master dedup every warehouse
runs before analytics.

100 TB design:

- **Blocking bounds the join.** Each pass is a self equi-join on a
  blocking key; with well-chosen keys the block size is O(1) in corpus
  size (more data → more blocks, not bigger blocks), so candidate volume
  scales linearly. Multiple passes (union + distinct) recover pairs a
  single key misses — the standard recall/cost dial.
- **Verify before closing.** ``levenshtein`` runs JVM-side per candidate
  pair (whole-stage codegen, no Python); only verified matches enter the
  closure.
- **Closure is O(log n) rounds** via large-star/small-star connected
  components (operators/graph.py) — a match chain of any length
  converges; the cluster id (minimum reachable id) is canonical and
  iteration-order independent, which keeps the whole pipeline
  oracle-checkable.
- Survivor election is a window-free groupBy-min broadcast back onto the
  assignment — no sort, no skew sensitivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.graph import connected_components

__all__ = ["blocked_candidate_pairs", "resolve_entities"]


def blocked_candidate_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_keys: list[Column],
    max_dist: int = 1,
) -> DataFrame:
    """Verified near-match pairs ``(id_a, id_b, dist)`` with ``id_a < id_b``.

    One self equi-join per blocking key; passes are unioned and deduped
    BEFORE the (cheap, but per-pair) edit-distance verify so a pair found
    by several keys is verified once. ``levenshtein``'s threshold form
    lets Spark abandon the DP early at scale.
    """
    passes = []
    for i, key in enumerate(block_keys):
        keyed = df.select(
            F.col(id_col).alias("_id"), F.col(name_col).alias("_nm"), key.alias("_k")
        )
        a, b = keyed.alias("a"), keyed.alias("b")
        passes.append(
            a.join(b, "_k")
            .where(F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                F.col("a._nm").alias("nm_a"),
                F.col("b._nm").alias("nm_b"),
            )
        )
    cands = passes[0]
    for p in passes[1:]:
        cands = cands.unionByName(p)
    return (
        cands.distinct()
        # threshold form: the DP abandons a pair as soon as the distance
        # provably exceeds max_dist (returns -1), turning the verify from
        # O(len²) to O(len·max_dist) per candidate
        .withColumn(
            "dist", F.levenshtein("nm_a", "nm_b", threshold=max_dist)
        )
        .where(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_keys: list[Column],
    max_dist: int = 1,
) -> DataFrame:
    """Full ER pass → one row per input record:
    ``(id_col, cluster_id, cluster_size, is_survivor)``.

    ``cluster_id`` is the minimum record id transitively reachable through
    verified matches (canonical); the survivor is the cluster minimum —
    swap in any deterministic scoring rule by replacing the min() election.
    Unmatched records come out as singleton clusters (their own survivor).
    """
    pairs = blocked_candidate_pairs(df, id_col, name_col, block_keys, max_dist)
    assign = connected_components(
        pairs, df.select(id_col), src="id_a", dst="id_b", id_col=id_col
    )
    sizes = assign.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    # clusters table is one row per entity — tiny next to the record table
    return assign.join(F.broadcast(sizes), "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("is_survivor"),
    )
