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

__all__ = ["start_parquet_sink"]


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
