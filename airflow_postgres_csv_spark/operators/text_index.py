"""Persisted full-text (BM25) index over a snapshot table — the lexical
twin of the persisted ANN indexes (operators/similarity.py).

``text_index_build`` tokenizes the corpus ONCE and commits the inverted
index as a versioned snapshot table of posting rows
``(token, doc_id, tf, dl)``, range-clustered on ``token`` and
Bloom-indexed on it; the corpus statistics BM25 needs at query time
(``n_docs``, ``avgdl``) ride the manifest's ``text_index`` key inside the
same atomic publish. ``text_index_search`` then serves a term query with
NO tokenization and NO scan of the document corpus: per-term
manifest-level planning (commit ranges → per-file zone maps → Bloom
probes on ``token``) picks the handful of posting files that can contain
the query terms, one pinned read with an ``IN`` filter fetches them, and
BM25 is computed from the stored tf/dl plus per-term document frequencies
counted over the fetched postings themselves.

At 100 TB this is the serving shape a retrieval pipeline needs: the
expensive pass (tokenize + posting aggregation) happens once per index
generation, rebuilds are new snapshot versions (searches pinned to a
version keep serving it), and the per-query cost is O(postings of the
query terms) — file-skipped down from the whole index by the same
hierarchical pruning every snapshot read uses. Scoring matches
``queries/text_queries.text_bm25_topk`` bit-for-bit: per-term
contributions rounded to 9 dp and summed as DECIMAL(28,9), so the
per-document score is independent of partitioning and engine.

No reference analog (the reference is an Airflow→Postgres ETL shim,
/root/reference/src/airflow_postgres_csv/operators.py) — extension
surface for LLM-curation retrieval (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.functions import texts as X

__all__ = [
    "text_index_build",
    "text_index_append",
    "text_index_delete",
    "text_index_plan",
    "text_index_search",
    "text_index_phrase_search",
]


def _postings(docs: DataFrame, id_col: str, text_col: str, positions: bool) -> DataFrame:
    """One tokenization pass → posting rows. With ``positions=True`` each
    posting also carries the token's sorted 0-based occurrence positions
    (the positional-index shape phrase queries need); tf stays the array
    size, dl the document token count."""
    if positions:
        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(X.tokens(text_col)).alias("pos", "token"),
        )
        dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
        return (
            toks.groupBy("token", "doc_id")
            .agg(
                F.count(F.lit(1)).alias("tf"),
                F.sort_array(F.collect_list("pos")).alias("positions"),
            )
            .join(dl, "doc_id")
            .select("token", "doc_id", "tf", "dl", "positions")
        )
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(X.tokens(text_col)).alias("token")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return (
        toks.groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(dl, "doc_id")
        .select("token", "doc_id", "tf", "dl")
    )


def text_index_build(
    docs: DataFrame,
    index_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bloom_bits: int = 4096,
    bloom_hashes: int = 4,
    positions: bool = False,
    extra: dict | None = None,
) -> dict:
    """Tokenize once, persist the inverted index. Postings are
    ``(token, doc_id, tf, dl)`` — dl denormalized onto every posting so a
    search needs no second table — clustered on ``token`` (tight per-file
    token extents for zone-map pruning) with a Bloom bitset per file for
    membership probes on hash-scattered terms. Corpus stats land in the
    manifest: readers can never see postings without the exact stats that
    normalize them. ``positions=True`` builds a POSITIONAL index (each
    posting carries the token's occurrence positions — Lucene's positional
    postings) enabling ``text_index_phrase_search``; the flag is recorded
    in the manifest and appends must match it."""
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_commit

    n_docs, sum_dl = (
        docs.select(F.size(X.tokens(text_col)).alias("dl"))
        .agg(F.count(F.lit(1)), F.sum("dl"))
        .first()
    )
    # stats are stored as EXACT integers; avgdl is derived at search time
    # with one double division — so an incrementally-appended index's
    # scores are bit-identical to a from-scratch rebuild's
    return snapshot_commit(
        _postings(docs, id_col, text_col, positions),
        index_root,
        mode="overwrite",
        partition_by=["token"],
        bloom_cols=["token"],
        bloom_bits=bloom_bits,
        bloom_hashes=bloom_hashes,
        extra={
            **(extra or {}),  # caller stamps (streaming batch id) ride the
            "text_index": {   # same atomic publish as the index stats
                "id_col": id_col,
                "n_docs": int(n_docs),
                "sum_dl": int(sum_dl or 0),
                "positions": bool(positions),
            }
        },
    )


def text_index_append(
    docs_new: DataFrame,
    index_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra: dict | None = None,
) -> dict:
    """Incrementally extend a persisted index with NEW documents — one
    append commit of the batch's postings plus exact integer stat
    updates, no rebuild, no touch of existing posting files. The caller
    contract is Iceberg-append-shaped: ``docs_new``'s ids must be
    disjoint from the indexed corpus (re-indexing a changed document
    means delete + append, or a rebuild). Because the stats are exact
    integers (``n_docs``, ``sum_dl``) and ``avgdl`` is derived at search
    time, an incrementally-built index scores bit-identically to a
    from-scratch build over the union."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_commit,
        snapshot_versions,
    )

    versions = snapshot_versions(index_root)
    if not versions:
        raise FileNotFoundError(f"no index at {index_root}; build first")
    meta = _load_manifest(index_root, versions[-1]).get("text_index") or {}
    if not meta:
        raise ValueError(f"{index_root} is not a text index")
    n_new, sum_new = (
        docs_new.select(F.size(X.tokens(text_col)).alias("dl"))
        .agg(F.count(F.lit(1)), F.sum("dl"))
        .first()
    )
    return snapshot_commit(
        _postings(docs_new, id_col, text_col, bool(meta.get("positions"))),
        index_root,
        mode="append",
        partition_by=["token"],
        extra={
            **(extra or {}),
            "text_index": {
                "id_col": meta["id_col"],
                "n_docs": meta["n_docs"] + int(n_new),
                "sum_dl": meta["sum_dl"] + int(sum_new or 0),
                "positions": bool(meta.get("positions")),
            }
        },
        expected_head=versions[-1],
    )


def text_index_delete(
    spark: SparkSession, index_root: str, doc_ids: list
) -> dict:
    """Remove documents from a persisted index WITHOUT rewriting postings
    — the GDPR-delete shape. One merge-on-read equality tombstone on
    ``doc_id`` plus the exact integer stat decrement, both inside the
    same atomic publish: every read path anti-joins the tombstone away,
    df/tf recompute over surviving postings, and because the stats stay
    exact, scores afterwards are bit-identical to an index rebuilt
    without the documents. Cost: one scan for the removed docs' lengths,
    O(ids) delete bytes, zero posting files rewritten (compaction folds
    the tombstone in later)."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_delete_mor,
        snapshot_read,
        snapshot_versions,
    )

    versions = snapshot_versions(index_root)
    if not versions:
        raise FileNotFoundError(f"no index at {index_root}")
    meta = _load_manifest(index_root, versions[-1]).get("text_index") or {}
    if not meta:
        raise ValueError(f"{index_root} is not a text index")
    ids = sorted(set(doc_ids))
    if not ids or not all(isinstance(i, int) for i in ids):
        raise ValueError("text_index_delete: doc_ids must be non-empty ints")
    gone = (
        snapshot_read(spark, index_root)
        .where(F.col("doc_id").isin(*ids))
        .select("doc_id", "dl")
        .distinct()
        .agg(F.count(F.lit(1)), F.sum("dl"))
        .first()
    )
    n_gone, dl_gone = int(gone[0]), int(gone[1] or 0)
    id_list = ", ".join(str(i) for i in ids)
    return snapshot_delete_mor(
        spark, index_root,
        condition=f"doc_id IN ({id_list})", key_col="doc_id",
        extra={
            "text_index": {
                "id_col": meta["id_col"],
                "n_docs": meta["n_docs"] - n_gone,
                "sum_dl": meta["sum_dl"] - dl_gone,
                "positions": bool(meta.get("positions")),
            }
        },
    )


def text_index_plan(
    index_root: str, terms: list[str], version: int | None = None
) -> dict:
    """Planning-only: the union of per-term file plans — which posting
    files a search for ``terms`` would read vs skip (zone maps + Bloom),
    the observable the build-once/serve-many tests pin."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        _load_manifest,
        snapshot_lookup_files,
        snapshot_versions,
    )

    v = version if version is not None else snapshot_versions(index_root)[-1]
    manifest = _load_manifest(index_root, v)
    kept: list[str] = []
    seen: set[str] = set()
    for term in sorted(set(terms)):
        plan = snapshot_lookup_files(index_root, "token", term, version=v)
        for rel in plan["kept"]:
            if rel not in seen:
                seen.add(rel)
                kept.append(rel)
    return {
        "version": v,
        "manifest": manifest,
        "kept": kept,
        "skipped": manifest["n_files"] - len(kept),
    }


def text_index_search(
    spark: SparkSession,
    index_root: str,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    version: int | None = None,
) -> DataFrame:
    """BM25 top-k from the persisted index: stats from the pinned
    manifest, postings from the term-pruned file set, document
    frequencies counted over the fetched postings (df is exactly the
    per-term posting count — no extra state). Output contract matches
    ``text_bm25_topk``: (doc_id, n_terms, bm25, rk), rk <= k."""
    from pyspark.sql.window import Window

    from airflow_postgres_csv_spark.operators.snapshots import _read_pinned

    plan = text_index_plan(index_root, terms, version=version)
    meta = plan["manifest"].get("text_index") or {}
    if not meta:
        raise ValueError(
            f"{index_root} v{plan['version']} is not a text index "
            "(no text_index manifest key)"
        )
    n_docs = meta["n_docs"]
    # one double division, the same op the from-scratch oracle runs
    # (CAST(SUM(dl) AS DOUBLE) / COUNT(*)) — exact-integer inputs make
    # incremental and rebuilt indexes score identically
    avgdl = meta["sum_dl"] / n_docs
    tf = _read_pinned(spark, index_root, plan["manifest"], plan["kept"]).where(
        F.col("token").isin(*terms)
    )
    df_tok = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df_docs") + 0.5) / (F.col("df_docs") + 0.5)
    )
    contrib = (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    )
    scored = (
        tf.join(F.broadcast(df_tok), "token")
        .withColumn("c", F.round(contrib, 9).cast("decimal(28,9)"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("c").cast("double").alias("bm25"),
        )
    )
    top = scored.orderBy(F.desc("bm25"), "doc_id").limit(k)
    w = Window.orderBy(F.desc("bm25"), "doc_id")
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select("doc_id", "n_terms", "bm25", "rk")
        .orderBy("rk")
    )


def text_index_phrase_search(
    spark: SparkSession,
    index_root: str,
    phrase: str,
    k: int = 20,
    version: int | None = None,
) -> DataFrame:
    """Exact phrase query over a POSITIONAL index (Lucene's phrase-query
    algorithm, Spark-shaped): tokenize the phrase with the index's own
    tokenizer, fetch ONLY the phrase terms' postings (token-pruned file
    set — the corpus text is never touched), align each term's position
    list by its offset in the phrase (``transform(positions, p -> p-i)``)
    and intersect: the surviving values are the phrase's start positions,
    so ``size(...)`` is the exact occurrence count. Per-query cost is
    O(postings of the phrase terms); the n-way join is an equi-join on
    ``doc_id`` over already-pruned posting sets. Output: top-``k`` docs
    by (n_occurrences desc, doc_id) with a rank column."""
    from pyspark.sql.window import Window

    from airflow_postgres_csv_spark.operators.snapshots import _read_pinned

    # tokenizing one literal phrase needs no Python-RDD relation — a
    # range(1) projection stays entirely in the JVM (localframe.py: the
    # pickled-slice path costs a Python-worker round trip per slice)
    row = spark.range(1).select(
        X.tokens(F.lit(phrase)).alias("tk")
    ).first()
    terms = list(row["tk"])
    if not terms or terms == [""]:
        raise ValueError("text_index_phrase_search: empty phrase")
    plan = text_index_plan(index_root, sorted(set(terms)), version=version)
    meta = plan["manifest"].get("text_index") or {}
    if not meta.get("positions"):
        raise ValueError(
            f"{index_root} v{plan['version']} is not a positional index; "
            "build with text_index_build(..., positions=True)"
        )
    tf = _read_pinned(spark, index_root, plan["manifest"], plan["kept"]).where(
        F.col("token").isin(*sorted(set(terms)))
    )
    def _shift(off: int):
        # NB: a two-parameter lambda would be interpreted by the HOF
        # machinery as (element, array_index) — bind the offset outside
        return lambda p: p - F.lit(off)

    joined = None
    for i, term in enumerate(terms):
        part = tf.where(F.col("token") == term).select(
            "doc_id",
            F.transform("positions", _shift(i)).alias(f"_p{i}"),
        )
        joined = part if joined is None else joined.join(part, "doc_id")
    inter = F.col("_p0")
    for i in range(1, len(terms)):
        inter = F.array_intersect(inter, F.col(f"_p{i}"))
    hits = (
        joined.select("doc_id", F.size(inter).alias("n_occurrences"))
        .where(F.col("n_occurrences") > 0)
    )
    top = hits.orderBy(F.desc("n_occurrences"), "doc_id").limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), "doc_id")
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select("doc_id", "n_occurrences", "rk")
        .orderBy("rk")
    )
