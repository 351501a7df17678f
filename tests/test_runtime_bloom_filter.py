"""Pin Spark's runtime Bloom-filter join pruning (the row-group-level
semi-join reduction that matters when a selective dim filter joins a
100 TB fact table): with the size thresholds scaled down to fixture
scale, the optimizer must inject BloomFilterMightContain on the fact
side of a dim-filtered equi-join, and the filtered result must be
correct. If this silently stops firing (config rename, plan-shape
change), large-scale joins lose their cheapest scan-side reduction.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_runtime_bloom_filter_injected_on_selective_dim_join(spark, tmp_path):
    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    (
        spark.range(200_000)
        .select(
            F.col("id"),
            (F.col("id") % 1000).alias("k"),
            (F.col("id") * 7).alias("v"),
        )
        .write.parquet(fact_path)
    )
    (
        spark.range(1000)
        .select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 10, "keep").otherwise("drop").alias("tag"),
        )
        .write.parquet(dim_path)
    )

    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB"
        )
        # force a shuffle join so the runtime filter is the only scan-side
        # reduction (broadcast joins get their own dynamic pruning)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path).where(F.col("tag") == "keep")
        joined = fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bloomfilter" in plan.lower() or "might_contain" in plan.lower(), plan[
            :3000
        ]
        row = joined.collect()[0]
        keep = [i for i in range(200_000) if i % 1000 < 10]
        assert row["n"] == len(keep)
        assert row["sv"] == sum(i * 7 for i in keep)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
