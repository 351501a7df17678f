"""Corpus-wide physical-plan lint: flag scale-hostile plan shapes.

For every registered batch query, build the DataFrame (analysis only — no
action) and scan the physical plan for patterns that do not survive a
100 TB corpus:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: all-pairs unless the
  query is on the BY_DESIGN list (tiny pair grids, explicit cross-join
  semantics, broadcast-bounded probes).

Streaming queries are skipped: materializing them runs an actual
streaming job, and their stateful operators are plan-asserted in
tests/test_streaming.py instead.

Usage::

    python -m tools.plan_audit [sf_dir]     # prints findings; exit 1 if any

The test-suite gate is tests/test_plans.py::test_corpus_plan_audit_clean.
"""

from __future__ import annotations

import re
import sys

# Queries where an unbounded-looking join IS the intended semantics and is
# bounded by construction. Every entry must say why.
BY_DESIGN: dict[str, str] = {
    "join_cross": "the query IS a cross join (tiny dims: region x nation)",
    "join_theta_nonequi": "non-equi theta join — BNLJ with a broadcast-small side is the plan",
    "theta_sketch_overlap": "5x5 per-lang sketch pair grid — 10 rows",
    "similarity_topk_bruteforce": "broadcast query side probing the corpus — bounded by |queries|",
    "dedup_embedding_cosine": "block-col equi-join; residual BNLJ only within broadcast-tiny blocks",
    "fuzzy_levenshtein_pairs": "explicit bounded candidate set (blocked pairs)",
    "join_asof_tolerance": "as-of tolerance join lowers to a range join on broadcast-small side",
    "join_asof_last_click": "as-of join: range condition over broadcast-small click side",
    "join_range_interval_overlap": "interval overlap is inherently non-equi; small side broadcast",
    "join_lateral_topn": "lateral correlated top-n: per-row probe of a broadcast-small side",
    "events_scd2_intervals": "SCD2 interval reconstruction: non-equi validity-range join, dim-sized",
    "orders_max_inflight": "interval sweep: non-equi self-overlap on a bounded window",
    "hist_width_bucket": "bucket spine is a literal few-row range joined non-equi",
    "recursive_month_spine": "month spine x filter is a tiny generated relation",
    "subquery_scalar": "scalar subquery becomes a 1-row broadcast",
    "decontam_overlap": "bench-side DISTINCT set is broadcast; join itself is equi on shingle",
    # --- scalar-aggregate broadcasts (keys=[] 1-row side; BNLJ is the
    # correct plan — verified in the executed plan text for each) ---
    "text_tfidf_topk": "n_docs scalar (HashAggregate keys=[]) broadcast into the idf expression",
    "text_unigram_logprob": "corpus token-total scalar broadcast",
    "text_bm25_topk": "avg doc length + n_docs scalars broadcast",
    "q11_important_parts": "HAVING threshold = scalar fraction of total broadcast",
    "q22_idle_customers": "avg acctbal threshold scalar broadcast",
    "data_mixture_weights": "corpus token-total scalar broadcast",
    "sample_dsir_importance": (
        "DSIR totals: 1-row (t_raw, t_target) scalar aggregate crossed "
        "into the O(n_buckets) model table before the broadcast join back"
    ),
    "events_funnel": "stage user-count scalars crossed into one conversion row",
    "events_heavy_hitters": "row-count scalar broadcast into the HAVING threshold",
    "hist_equi_depth": (
        "distributed global-ntile (global_order.py): scalar stats broadcast + "
        "64-row bucket-offset theta-join"
    ),
    "hll_sketch_mergeable": "sketch estimate vs exact-count scalar invariant comparison",
    "count_min_sketch_freq": "n_total 1-row scalar broadcast into the error-bound flag",
    "basket_pair_rules": "n_orders 1-row scalar broadcast into the lift expression",
    "events_session_bounce": "1-row totals aggregate crossed into the bounce-rate column",
    "customers_gini_revenue": (
        "global-order machinery's 1-row min/max stats broadcast + bucket-"
        "offset theta-join (same shape as window_ntile_first_last)"
    ),
    "parts_abc_classes": (
        "global-order cumsum broadcasts + one revenue-total scalar crossed "
        "into the exact-decimal class boundaries"
    ),
    "stats_weighted_median": (
        "distributed global-order cumsum (1-row stats + bucket-offset "
        "broadcasts) + one w_total scalar broadcast into the half-weight filter"
    ),
    "embedding_whiten": (
        "64-row dim-stats collapsed to a 1-row (means, stds) array pair, "
        "broadcast-crossed into the per-row zip-transform"
    ),
    "text_bpe_train_merges": (
        "per-round argmax merge pair is a LIMIT-1 broadcast crossed into a "
        "map-only replace projection (3 rounds)"
    ),
    "bloom_prejoin_prune": "two 1-row count aggregates crossed into the summary row",
    "similarity_ann_pq_recall": "recall eval: corpus x broadcast query set, bounded by |queries|",
    "kll_quantile_sketch": "quantile estimates vs exact-rank scalars invariant comparison",
    "similarity_ann_lsh_recall": "recall eval: corpus x broadcast query set, bounded by |queries|",
    "similarity_ann_ivf_recall": "recall eval: corpus x broadcast query set, bounded by |queries|",
    "snapshot_catalog_ddl": (
        "per-catalog-version probe: two 1-row count/flag aggregates "
        "crossed into one summary row per version (4 rows)"
    ),
    "similarity_ann_incremental": "recall eval: corpus x broadcast query set, bounded by |queries|",
    "similarity_ann_autotune": (
        "recall eval: exact reference is corpus x broadcast held-out query "
        "set, bounded by |queries|; derivation replays the metadata-sized "
        "probe set through the serve path"
    ),
    "streaming_ann_index_live": (
        "recall eval: corpus x broadcast query set, bounded by |queries|; "
        "live-vs-batch set equality over two k-bounded search results"
    ),
    "similarity_ann_ivfpq": "recall eval: corpus x broadcast query set, bounded by |queries|",
    "similarity_ann_delete": (
        "post-delete equivalence eval: PQ ADC is corpus x broadcast query "
        "set bounded by |queries|; 1-row flags ride one summary row"
    ),
    "similarity_ann_persisted": (
        "recall eval over PERSISTED indexes: PQ ADC is corpus x broadcast "
        "query set bounded by |queries|; the 1-row recall/roundtrip flags "
        "cross into one summary row"
    ),
    "similarity_radius_search": "radius probe: corpus x broadcast query set, bounded by |queries|",
    "window_ntile_first_last": (
        "distributed global-ntile: 1-row min/max scalar broadcast + running-sum "
        "theta-join over the 64-row bucket-count table (B^2 = 4096 pairs max)"
    ),
    "events_rfm_segments": (
        "distributed global-ntile x3 (global_order.py): scalar stats broadcast + "
        "64-row bucket-offset theta-joins"
    ),
    "supplier_pareto": (
        "distributed global rank/cumsum (global_order.py): scalar stats broadcast "
        "+ 64-row bucket-offset theta-join"
    ),
    "shard_plan_snake": (
        "distributed global rank (global_order.py): scalar stats broadcast + "
        "64-row bucket-offset theta-join"
    ),
    "text_bigram_logprob": "vocabulary-size scalar (HashAggregate keys=[]) broadcast",
    "text_kneser_ney_bigram": "bigram-type-count scalar (1-row aggregate) broadcast",
    "search_hybrid_rrf": (
        "1-row query-vector broadcast into the cosine leg + the BM25 "
        "1-row corpus-stats broadcast (both legs truncate to top-50 "
        "before fusion)"
    ),
    "search_eval_ndcg": (
        "retrieval eval: corpus x broadcast 5-query set, bounded by "
        "|queries| (the recall-eval precedent)"
    ),
    "snapshot_catalog_txn": (
        "two 1-row per-version aggregates crossed into one summary row "
        "per catalog version"
    ),
    "snapshot_catalog_as_of": (
        "two 1-row count aggregates crossed into the as-of summary row"
    ),
    "cluster_kmeans_lloyd": (
        "k-means assignment: the k x d centroid matrix is a 1-row broadcast "
        "crossed into the per-row arg-min array expression (the MLlib idiom); "
        "nothing joined scales with the corpus"
    ),
    "stats_ks_by_source": (
        "ECDF grid = |sources| x |distinct lengths| cross of two POST-AGG "
        "value-domain tables (never raw rows), + 1-row corpus-total scalar "
        "broadcast into the cross-multiplied D numerator"
    ),
    "sample_temperature_mixture": (
        "two 1-row scalar broadcasts (token total, sum of p^alpha) crossed "
        "into the per-language mixture arithmetic"
    ),
    "sample_classifier_topk": (
        "classifier logit ranking through the global-order machinery "
        "(global_order.py): 1-row min/max stats broadcast + bucket-offset "
        "broadcast — both O(1)/O(buckets) crossed onto the scored rows"
    ),
    "sample_perplexity_buckets": (
        "unigram-LM token-total scalar broadcast + the global-order "
        "machinery's 1-row stats / bucket-offset broadcasts (same shape as "
        "window_ntile_first_last)"
    ),
}

BAD_PATTERNS = ("CartesianProduct", "BroadcastNestedLoopJoin")

# Queries allowed to keep an UNPARTITIONED window (single-task sort): the
# windowed relation must be bounded by construction, not by the corpus.
# Unbounded global orderings use operators/global_order.py instead.
GLOBAL_WINDOW_OK: dict[str, str] = {
    "events_user_growth": "window over calendar days — bounded by time span, not corpus size",
    "orders_max_inflight": "interval sweep over distinct days — bounded by time span",
    "text_bm25_topk": "rank window runs over the top-20 survivors of TakeOrderedAndProject",
    "text_index_bm25_search": (
        "rank window runs over the top-20 survivors of TakeOrderedAndProject "
        "(same contract as text_bm25_topk, served from the persisted index)"
    ),
    "text_index_incremental_search": (
        "rank window runs over the top-20 survivors of TakeOrderedAndProject "
        "(same contract as text_bm25_topk, incremental index)"
    ),
    "text_index_phrase_search": (
        "rank window runs over the top-20 survivors of TakeOrderedAndProject "
        "(phrase hits, term-pruned postings)"
    ),
    "sql_string_surface": "rank over c_mktsegment groups — 5 rows",
    "skyline_orders": (
        "phase-2 refine sweep of the two-phase skyline (operators/skyline.py): "
        "input is the union of per-bucket Pareto-minimal fronts, not the corpus "
        "(phase 1 is a partitioned window over 32 hash buckets)"
    ),
    "stats_ks_by_source": (
        "pooled-ECDF cumsum over the COMPRESSED VALUE DOMAIN (distinct "
        "n_chars values after a hash-agg) — bounded by the length domain, "
        "not corpus size"
    ),
    "search_hybrid_rrf": (
        "rank/fusion windows run over the ≤50 survivors of each leg's "
        "TakeOrderedAndProject truncation, never the corpus"
    ),
}

# First windowspecdefinition arg is an ordering column => no partition keys.
_GLOBAL_WINDOW_RE = r"windowspecdefinition\(\w+#\d+L? (?:ASC|DESC)"

# Queries with selective literal predicates on fixture columns: the filter
# MUST reach the parquet scan (PushedFilters non-empty), otherwise the scan
# reads the whole table before filtering — the difference between touching
# one month and touching 100 TB.
PUSHDOWN_EXPECT = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q12_late_shipments",
    "q14_promo_effect",
    "q19_disjunctive_revenue",
    "filter_project",
    "decontam_overlap",
)


def audit(sf_dir: str) -> dict[str, list[str]]:
    """Return {query_name: [offending pattern, ...]} for non-whitelisted hits."""
    import os

    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if _repo not in sys.path:
        sys.path.insert(0, _repo)

    from airflow_postgres_csv_spark.plans import introspect as I
    from airflow_postgres_csv_spark.queries import registry
    from airflow_postgres_csv_spark.session import get_spark

    spark = get_spark("plan_audit")
    findings: dict[str, list[str]] = {}
    for name, rq in registry().items():
        if name.startswith("streaming_"):
            continue
        try:
            df = rq.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - audit must see every query
            findings[name] = [f"PLAN_BUILD_FAILED: {type(exc).__name__}: {exc}"[:200]]
            continue
        hits = [p for p in BAD_PATTERNS if p in plan]
        if hits and name not in BY_DESIGN:
            findings[name] = hits
        if re.search(_GLOBAL_WINDOW_RE, plan) and name not in GLOBAL_WINDOW_OK:
            findings.setdefault(name, []).append("UNPARTITIONED_WINDOW")
        if name in PUSHDOWN_EXPECT and not I.pushed_filters(df):
            findings.setdefault(name, []).append("NO_PUSHED_FILTERS")
    return findings


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    findings = audit(sf_dir)
    for name, hits in sorted(findings.items()):
        print(f"FLAG  {name}: {', '.join(hits)}")
    print(f"{len(findings)} flagged")
    sys.exit(1 if findings else 0)


if __name__ == "__main__":
    main()
