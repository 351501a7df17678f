"""Streaming sinks with exactly-once recovery semantics.

The file sink + checkpoint pair is the durable end of a production
pipeline: offsets and sink metadata commit through the checkpoint's
write-ahead log, so a crashed/restarted query resumes from the last
committed micro-batch without dropping or duplicating rows. (The memory
sink in ``windows.run_to_memory_sink`` is the test harness; this is the
real thing.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

__all__ = [
    "start_parquet_sink",
    "jdbc_upsert_batch",
    "start_jdbc_upsert_sink",
    "snapshot_batch_commit",
    "start_snapshot_sink",
]


def start_parquet_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> StreamingQuery:
    """Write a streaming DataFrame to a parquet directory, exactly-once.

    The checkpoint directory carries the offset log + sink commit log;
    restarting with the same ``checkpoint_dir`` resumes after the last
    committed batch (reprocessing nothing), and readers of ``out_dir``
    see only committed files via the sink's ``_spark_metadata`` log.
    """
    return (
        stream_df.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def jdbc_upsert_batch(
    batch_df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    driver: str = "org.postgresql.Driver",
) -> None:
    """Upsert one (micro-)batch into a JDBC table, idempotently.

    Shape: Spark writes the batch into a staging table in parallel
    (truncate-overwrite), then ONE ``MERGE INTO target USING staging ON
    keys`` statement runs on a single connection — matched rows update,
    new rows insert. Because MERGE is keyed, replaying a micro-batch after
    a crash converges to the same table state: at-least-once delivery from
    the checkpoint + an idempotent sink = effective exactly-once.

    The merge statement executes driver-side over ``java.sql`` (py4j);
    the data volume flows through the parallel staging write — the single
    connection carries only the one DDL/DML statement, not rows.
    """
    from airflow_postgres_csv_spark.operators.jdbc import jdbc_write, quote_identifier

    spark = batch_df.sparkSession
    staging = table + "_stg"
    jdbc_write(batch_df, url=url, table=staging, truncate=True, driver=driver)

    q = quote_identifier
    cols = batch_df.columns
    non_keys = [c for c in cols if c not in key_cols]
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
    set_clause = ", ".join(f"{q(c)} = s.{q(c)}" for c in non_keys)
    insert_cols = ", ".join(q(c) for c in cols)
    insert_vals = ", ".join(f"s.{q(c)}" for c in cols)
    merge = (
        f"MERGE INTO {q(table)} t USING {q(staging)} s ON {on} "
        + (f"WHEN MATCHED THEN UPDATE SET {set_clause} " if non_keys else "")
        + f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )

    jvm = spark._jvm
    jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:  # create the target from the staging shape on first contact
            st.execute(f"CREATE TABLE {q(table)} AS SELECT * FROM {q(staging)} WITH NO DATA")
        except Exception:
            pass  # already exists
        st.execute(merge)
    finally:
        conn.close()


def start_jdbc_upsert_sink(
    stream_df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    checkpoint_dir: str,
    driver: str = "org.postgresql.Driver",
) -> StreamingQuery:
    """Stream into a JDBC table with keyed upserts (``foreachBatch``).

    Spark's built-in jdbc sink is append-only; real pipelines need
    merge-by-key. foreachBatch + :func:`jdbc_upsert_batch` provides it
    with exactly-once effective semantics: the checkpoint replays
    uncommitted batches, the keyed MERGE makes replays no-ops.
    """
    return (
        stream_df.writeStream.foreachBatch(
            lambda batch_df, _bid: jdbc_upsert_batch(
                batch_df, url=url, table=table, key_cols=key_cols, driver=driver
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def snapshot_batch_commit(
    batch_df: DataFrame, batch_id: int, root: str, retries: int = 2
) -> bool:
    """foreachBatch body: commit one micro-batch as a snapshot version,
    exactly once.

    Structured Streaming may REPLAY a micro-batch after a crash between the
    sink action and the checkpoint commit; idempotence must come from the
    sink. The batch id is threaded into the manifest dict BEFORE the
    commit's single atomic publish (``snapshot_commit(extra=...)``), so
    there is exactly one commit point: a crash either published the batch
    (with its id recorded) or left the dataset untouched — never a
    committed batch without its stamp. A batch whose id is not above the
    recorded high-water mark is dropped, so replays become no-ops and the
    snapshot history holds each batch exactly once. (Same keyed-dedup
    discipline as the JDBC MERGE sink, expressed in dataset versions.)

    The high-water mark is the MAX ``last_batch_id`` across all retained
    manifests, not the latest manifest's: interleaved maintenance commits
    (``snapshot_compact``, a batch ETL append) carry the stamp forward via
    manifest inheritance, and even if one is created by an old engine that
    does not, the scan keeps the gate closed instead of silently reopening
    the duplicate window. Returns True when a version was committed,
    False on replay-skip.
    """
    from airflow_postgres_csv_spark.operators import snapshots as S

    last = -1
    for v in S.snapshot_versions(root):
        last = max(last, S._load_manifest(root, v).get("last_batch_id", -1))
    if batch_id <= last:
        return False
    # retries: a concurrent MAINTENANCE commit (compact, batch ETL append)
    # winning the version race must not fail the micro-batch — appends
    # rebase in O(manifest) with the batch-id stamp still inside the one
    # atomic publish (operators/snapshots.py optimistic concurrency).
    S.snapshot_commit(
        batch_df, root, extra={"last_batch_id": batch_id}, retries=retries
    )
    return True


def start_snapshot_sink(
    stream_df: DataFrame, root: str, checkpoint_dir: str
) -> StreamingQuery:
    """Stream into a versioned snapshot dataset: each micro-batch is one
    append commit (the bronze-layer ingestion pattern). Restart-safe via
    ``snapshot_batch_commit``'s batch-id gate; downstream consumers use
    ``snapshot_changes`` to process exactly the newly ingested files."""
    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: snapshot_batch_commit(df, bid, root))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
