"""Distributed clustering queries (SURVEY.md §2.3 — similarity/ML-prep).

``cluster_kmeans_lloyd`` is full Lloyd's k-means over the ``embeddings``
table expressed Spark-first, the idiom Spark MLlib's own KMeans uses:

- **Assignment is shuffle-free.** The k×d centroid matrix is a 1-row
  broadcast (``crossJoin(broadcast(...))``) and the arg-min over k
  squared distances is a single JVM array expression per row
  (``transform`` over centroids → ``aggregate``/``zip_with`` fold →
  ``array_min`` on ``struct(d2, cid)``) — no explode to n×k rows, no
  per-point shuffle, whole-stage codegen end to end.
- **The update step aggregates k·d partial sums** (posexplode →
  groupBy(cid, dim) with map-side combine → k·d rows), and the new
  centroids — O(k·d) metadata, exactly what MLlib collects every
  iteration — are brought to the driver and re-broadcast. At 100 TB the
  per-iteration cost is one columnar scan plus a k·d-row aggregate;
  nothing driver-side scales with n.

Engine-exact math (the ``embedding_whiten`` recipe): inputs snap to a
DECIMAL(18,9) grid, per-row distance folds are identically parenthesized
IEEE trees in Spark (``aggregate`` from 0.0) and DuckDB (``list_reduce``;
0.0+x ≡ x so the trees agree), cross-row centroid sums go through exact
decimals, and centroids are re-rounded to the 9-dp grid each round — so
assignments, and therefore the whole trajectory, are bit-identical and
the DuckDB oracle simply unrolls the same iterations as CTEs.

Reference scope: extension surface (north star §C); the reference engine
(/root/reference/src/airflow_postgres_csv/operators.py:12-98) has no
clustering — this is the training-data-pipeline surface (corpus
clustering for mixture design / SemDeDup-style curation).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, StructField, StructType

from airflow_postgres_csv_spark.operators.localframe import arrow_local_df
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import t

_K = 8
_ITERS = 2  # centroid-update rounds; assignment under c_ITERS is the output

# Snap every coordinate to the DECIMAL(18,9) grid (exact in both engines;
# decimal→double is the same IEEE rounding everywhere).
_GRID = "transform(embedding, x -> cast(cast(cast(x as double) as decimal(18,9)) as double))"

# arg-min over the broadcast centroid list: struct ordering gives
# (smallest d2, then smallest cid) — ties impossible to break wrongly
# since both engines see bit-identical d2 doubles.
_BEST = """
array_min(transform(cents, (c, i) -> struct(
  aggregate(zip_with(xd, c, (a, b) -> (a - b) * (a - b)),
            cast(0.0 as double), (s, v) -> s + v) as d2,
  i as cid)))
"""


def _assign(pts, spark, cents):
    """Per-point nearest-centroid assignment — broadcast, shuffle-free."""
    cdf = arrow_local_df(spark, 
        [(cents,)],
        StructType([StructField("cents", ArrayType(ArrayType(DoubleType())))]),
    )
    return pts.crossJoin(F.broadcast(cdf)).select(
        "vec_id", "label", "xd", F.expr(_BEST).alias("best")
    )


def _kmeans_lloyd(spark, sf_dir):
    pts = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.expr(_GRID).alias("xd")
    )
    # Deterministic init: the k lowest-id vectors (vec_id is 0..n-1).
    cents = [
        r["xd"]
        for r in pts.filter(F.col("vec_id") < _K).orderBy("vec_id").collect()
    ]
    for _ in range(_ITERS):
        a = _assign(pts, spark, cents)
        stats = (
            a.select(F.col("best.cid").alias("cid"), F.posexplode("xd").alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(
                F.sum(F.col("x").cast("decimal(18,9)")).alias("sx"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cid",
                "dim",
                F.round(F.col("sx").cast("double") / F.col("n"), 9).alias("c9"),
            )
        )
        # O(k·d) metadata collect — the MLlib per-iteration idiom; nothing
        # here scales with the row count.
        upd: dict[int, list] = {}
        for r in stats.collect():
            upd.setdefault(r["cid"], [None] * len(cents[0]))[r["dim"]] = r["c9"]
        # An empty cluster keeps its previous centroid.
        cents = [upd.get(i, cents[i]) for i in range(_K)]
    out = _assign(pts, spark, cents)
    return out.select(
        "vec_id",
        "label",
        F.col("best.cid").alias("cid"),
        F.round(F.col("best.d2"), 6).alias("d2r"),
    ).orderBy("vec_id")


def _oracle() -> str:
    d2 = (
        "list_reduce(list_transform(list_zip(p.xd, c.cvec),"
        " s -> (s[1] - s[2]) * (s[1] - s[2])), (a, b) -> a + b)"
    )
    parts = [
        """
        WITH pts AS MATERIALIZED (
          SELECT vec_id, label,
                 list_transform(embedding,
                   x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9)) AS DOUBLE)) AS xd
          FROM embeddings
        ),
        c0 AS MATERIALIZED (
          SELECT CAST(vec_id AS INT) AS cid, xd AS cvec FROM pts WHERE vec_id < 8
        )"""
    ]
    for i in range(1, _ITERS + 1):
        parts.append(
            f""",
        a{i} AS MATERIALIZED (
          SELECT vec_id, cid, d2,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
          FROM (SELECT p.vec_id, c.cid, {d2} AS d2
                FROM pts p CROSS JOIN c{i - 1} c)
        ),
        s{i} AS MATERIALIZED (
          SELECT a.cid, u.i AS dim,
                 ROUND(CAST(SUM(CAST(p.xd[u.i] AS DECIMAL(18,9))) AS DOUBLE)
                       / COUNT(*), 9) AS c9
          FROM a{i} a JOIN pts p USING (vec_id),
               unnest(generate_series(1, 64)) AS u(i)
          WHERE a.rn = 1
          GROUP BY a.cid, u.i
        ),
        c{i} AS MATERIALIZED (
          SELECT c.cid, COALESCE(s.cvec, c.cvec) AS cvec
          FROM c{i - 1} c LEFT JOIN
               (SELECT cid, list(c9 ORDER BY dim) AS cvec FROM s{i} GROUP BY cid) s
          USING (cid)
        )"""
        )
    parts.append(
        f""",
        fin AS (
          SELECT vec_id, cid, d2,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
          FROM (SELECT p.vec_id, c.cid, {d2} AS d2
                FROM pts p CROSS JOIN c{_ITERS} c)
        )
        SELECT p.vec_id, p.label, f.cid, ROUND(f.d2, 6) AS d2r
        FROM fin f JOIN pts p USING (vec_id)
        WHERE f.rn = 1
        ORDER BY p.vec_id"""
    )
    return "".join(parts)


register("cluster_kmeans_lloyd", _oracle())(_kmeans_lloyd)
