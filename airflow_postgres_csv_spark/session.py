"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]`` in one JVM, but every config here is chosen
so the same code runs unchanged on a multi-executor cluster at ~100 TB:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast-join conversion from runtime stats).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster this
  is a starting point that AQE coalesces/expands per stage.
- Arrow enabled so any pandas-UDF path is batch-vectorized, never per-row.
- Session timezone pinned to UTC so timestamp semantics are deterministic
  and match the DuckDB oracle used in differential tests.
- ANSI mode on (Spark 4 default) so casts/overflow error like
  PostgreSQL — the engine whose delegated-SQL surface we reproduce
  (reference operators.py:80 pushes user SQL to the PG planner).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "airflow-postgres-csv-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for local runs; on a real cluster pass ``None`` in spark-submit mode and
    the cluster manager's master wins.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- shuffle & adaptivity (the 100 TB levers) ---
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # iterative operators (pagerank_integer) chain LAZY localCheckpoints
        # whose whole prior-round lineage can materialize inside one
        # executeBroadcast wait; the 300 s default is the one failure mode
        # the lazy chain adds on a big cluster, so give broadcast builds
        # the same patience as a long stage (ADVICE r11: document/raise)
        .config("spark.sql.broadcastTimeout", "3600")
        # --- python interop: Arrow batches, never per-row pickling ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # call-site capture for error messages costs 3 py4j round trips +
        # a Python stack walk on EVERY DataFrame API call (pyspark/errors/
        # utils.py::_with_origin) — pure driver-side latency, off for
        # production runs at any scale (guide §5: the driver should do
        # almost no work; errors lose only the user-code line annotation).
        # NOTE: pyspark caches this flag PROCESS-WIDE from the first
        # session (_enable_debugging_cache), so later sessions in the same
        # process inherit it; SPARK_GRAFT_DEBUG=1 is the escape hatch for
        # debugging sessions that want call-site annotations back.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            "true" if os.environ.get("SPARK_GRAFT_DEBUG") else "false",
        )
        # Arrow batch size = model/decoder batch size for pandas UDFs
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # split size for file scans: 128 MiB keeps scan tasks memory-safe
        # at any corpus size (tune up for wide clusters, down for skew)
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # --- determinism / oracle parity ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        # parquet ns timestamps (events.ts) read as raw longs; catalog.load
        # rebuilds a micros TimestampType (matches DuckDB's ns->us truncation)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- local-mode memory; irrelevant under a cluster manager ---
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
