"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via a count-style action (driver-side collect of
aggregated results only — never a full-table collect). The first run of the
session pays JVM/codegen warmup; we run one untimed warmup action first so
the numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from airflow_postgres_csv_spark.queries import registry  # noqa: E402
from airflow_postgres_csv_spark.session import get_spark  # noqa: E402

# Headline set: the flagship agg, the heavy joins, windows, and the
# representative extension ops. Kept in sync with the registry as modules
# land — any registered name present here is timed.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_nation_profit",
    "q7_nation_volume",
    "q13_order_distribution",
    "q16_part_supplier_counts",
    "q21_sole_late_supplier",
    "join_orders_customer_inner",
    "join_asof_last_click",
    "window_running_sum",
    "window_topk_per_group",
    # distributed global-order path (operators/global_order.py)
    "window_ntile_first_last",
    "events_rfm_segments",
    "supplier_pareto",
    "agg_cube",
    "dedup_exact_documents",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    # iterative/graph dedup path (VERDICT r3 #6): the slowest local
    # verifies, benched so regressions in star-CC / SimHash banking show up
    "dedup_simhash",
    "dedup_clusters",
    "dedup_cluster_survivors",
    "dedup_segments_clean",
    "similarity_ann_pq_recall",
    "count_min_sketch_freq",
    # round-4 additions: join-heavy graph analytics + global-order path
    "graph_triangle_count",
    "graph_pagerank",
    "graph_kcore",
    "dedup_jaccard_prefix",
    "layout_zorder_extents",
    "sample_priority_topk",
    "skyline_orders",
    "rollup_ewma_dyadic",
    "shard_plan_snake",
    "text_bigram_logprob",
    "text_bpe_train_merges",
    "text_bm25_topk",
    "theta_sketch_overlap",
    "join_salted_replicated",
    "basket_pair_rules",
    "text_winnowing_fingerprints",
    "dedup_winnowing_pairs",
    "text_hashed_ngram_classifier",
    "similarity_topk_bruteforce",
    "similarity_ann_lsh_recall",
    "text_token_stats",
    "text_tfidf_topk",
    "text_chunk_windows",
    "text_pack_sequences",
    "text_repetition",
    "sample_stratified_lang",
    "rollup_gapfill_locf",
    "events_tumbling_window",
    "events_sessionization",
    "events_windowed_funnel",
    "dedup_incremental_minhash",
    "geo_grid_nearest",
    "multimodal_decode_meta",
    "multimodal_audio_features",
    "streaming_session_live",
    # round-5 additions: the versioned-snapshot subsystem's three
    # representative shapes (incremental rollup, zone-map pruned scan,
    # incremental curation)
    "snapshot_incremental_rollup",
    "snapshot_pruned_scan",
    "pipeline_snapshot_curation",
    # round-6 additions: the snapshot WRITE path (COW merge rewrite,
    # merge-on-read delete commits) — the most expensive maintenance
    # operators, previously untimed
    "snapshot_merge_upsert",
    "snapshot_delete_mor",
    # late round 6: the snapshot STREAMING READ path (Python Data Source
    # feed + the full medallion loop with the exactly-once sink)
    "streaming_snapshot_feed_live",
    "pipeline_snapshot_medallion",
    # end of round 6: the CDC stack — incremental view maintenance with
    # retractions driven by the batch change feed (table_changes + one
    # stamped merge commit per refresh)
    "snapshot_ivm_rollup",
    # session-6b additions: the new LLM-curation operators — semantic
    # dedup (cell self-join) and the expectations write gate (observe +
    # two snapshot commits)
    "dedup_semantic_semdedup",
    "pipeline_expectations_quarantine",
    # session-6c additions: iterative distributed clustering (broadcast
    # centroids, two Lloyd rounds + final assignment) and the per-source
    # KS drift statistic (value-domain-compressed ECDF windows)
    "cluster_kmeans_lloyd",
    "stats_ks_by_source",
    # session-6d additions: hybrid retrieval fusion and the multi-table
    # atomic transaction write path (two txns + catalog-read joins)
    "search_hybrid_rrf",
    "snapshot_catalog_txn",
    # round-7 additions: build-once/serve-many ANN (two index builds +
    # two persisted searches + the exact-recall probe), catalog DDL,
    # full MERGE INTO clause surface, and the persisted BM25 index
    "similarity_ann_persisted",
    "snapshot_catalog_ddl",
    "snapshot_merge_into_clauses",
    "text_index_bm25_search",
    # round-8 additions: ANN tombstone eviction (two builds + delete +
    # post-delete/filtered-equivalence searches), 3-column curve
    # clustering (stage + OPTIMIZE + pruned 3-D box scan), and the
    # schema-evolving merge with full-history CDC replica replay
    "similarity_ann_delete",
    "snapshot_zorder3_pruned",
    "snapshot_merge_schema_evolution",
    "snapshot_optimize_incremental",
    "similarity_ann_ivfpq",
    "snapshot_sketch_distinct",
    "text_index_phrase_search",
    # round-9 additions: declared-partition-spec staging + pruned scan,
    # SQL-view join over two snapshot tables, DESCRIBE DETAIL from the
    # root rollups, the three exactly-once streaming sinks (text index
    # across a checkpointed restart, ANN ingest, dedup-on-ingest with the
    # fingerprint table), and the recall-knob derivation ladder
    "snapshot_partition_spec_pruned",
    "snapshot_sql_read",
    "snapshot_table_stats",
    "streaming_text_index_live",
    "streaming_ann_index_live",
    "streaming_dedup_ingest_live",
    "similarity_ann_autotune",
    "snapshot_partition_evolution",
    # round-9 session 2: branches/WAP/transactions (fast-forward +
    # rebase publish, streaming WAP gate) and join-time runtime pruning
    "snapshot_wap_branch",
    "snapshot_txn_rebase",
    "streaming_wap_live",
    "snapshot_join_runtime_pruned",
    "snapshot_catalog_wap",
    "text_quality_classifier",
    "sample_classifier_topk",
    # round-10 additions: orphan-file GC, column-rename lineage reads,
    # catalog-level branch fork/stage/publish, and the score-on-ingest
    # classifier sink across a checkpointed restart
    "snapshot_vacuum_orphans",
    "snapshot_alter_rename",
    "snapshot_catalog_branch",
    "streaming_classifier_live",
    "snapshot_metadata_history",
    # round-10 session 2: metadata-only COUNT(*)/MIN/MAX with the
    # exact-or-scan fallback under merge-on-read deletes, and
    # catalog-stored views resolved over the reading version's pins
    "snapshot_fast_count",
    "snapshot_catalog_view",
    # leakage-safe splits: near-dup clusters never straddle train/test
    "split_cluster_safe",
    # partition-filtered metadata count: identity tuples decide per file
    "snapshot_partition_count",
    # materialized views: refresh-as-one-flip, stale-by-design serving
    "snapshot_catalog_mview",
    # declared CHECK constraints enforced on every value-introducing write
    "snapshot_constraints",
    # streaming IVM: live per-group rollup with retractions, exactly-once
    "streaming_ivm_live",
    # incremental mview: catalog refresh via change-feed IVM at the pin
    "snapshot_catalog_mview_ivm",
    # metadata-only SUM pushdown via the per-commit integral sum rollup
    "snapshot_fast_sum",
    # round-11 additions: metadata-only GROUP BY (sidecar rollup, zero
    # data I/O), declared sort orders (pruning payoff pinned in-query),
    # and mview refreshes staged + published atomically on catalog branches
    "snapshot_partition_rollup",
    "snapshot_sort_order_pruned",
    "snapshot_catalog_branch_mview",
    # two-table join IVM: dJ = dA x B1 + A0 x dB, retractions both sides
    "snapshot_catalog_mview_join_ivm",
    # SQL-text DML: DELETE/UPDATE(keyless MOR)/MERGE/INSERT statements
    "snapshot_sql_dml",
    # metadata GROUP BY: composite keys + where-filtered, zero data I/O
    "snapshot_partition_rollup_where",
    # streaming join IVM: facts stream, dimension moves out-of-band
    "streaming_join_ivm_live",
    # partition-scoped compaction: hot-partition rewrite, rest by pointer
    "snapshot_compact_partition",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    reg = registry()
    names = [n for n in HEADLINE if n in reg] or sorted(reg)[:5]
    spark = get_spark("bench")

    # warmup: trigger JVM + codegen + parquet footer reads once, untimed;
    # the mapInPandas no-op forks the Python worker pool so Arrow-UDF
    # queries measure steady-state execution, not daemon startup. Every
    # fixture table is scanned once so footer/page-cache first-touch cost
    # isn't charged to whichever timed query happens to read it first.
    try:
        from airflow_postgres_csv_spark.catalog import TABLES, load

        for tbl in TABLES:
            load(spark, sf_dir, tbl).count()
        reg[names[0]].fn(spark, sf_dir).count()
    except Exception as exc:  # noqa: BLE001 — warmup failure must not kill the run
        print(f"warmup failed: {exc}", file=sys.stderr)
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    # one broken query must never zero the whole bench: isolate each
    # timed run and always emit the JSON line (r2 lost all numbers to a
    # single AnalysisException before the first print).
    # Each query is timed twice (three times when still >2 s — the heavy
    # queries are where neighbor CPU steal shows) and the MIN is reported:
    # this measures the code's steady-state cost, not transient host noise
    # (measured on this box: identical queries vary 1.3 s -> 22 s across
    # runs; the same pagerank build measured 16.8 s then 6.6 s minutes
    # apart in round 5; min-of-N collapses that variance).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        best: float | None = None
        reps = 2
        i = 0
        while i < reps:
            i += 1
            t0 = time.time()
            try:
                df = reg[name].fn(spark, sf_dir)
                df.count()
                elapsed = time.time() - t0
                best = elapsed if best is None else min(best, elapsed)
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"bench query {name} failed: {exc}", file=sys.stderr)
                break
            if i == 2 and best > 2.0:
                reps = 3
        if best is not None:
            timings[name] = round(best, 3)
            errors.pop(name, None)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
