"""JSONL (newline-delimited JSON) source/sink.

The reference's only interchange format is CSV (reference
operators.py:80, 163-170); JSONL is its schema-carrying sibling and the
de-facto interchange format for LLM training corpora, so the engine
treats it as a first-class source/sink with the same option surface
shape (gzip, single-file vs parallel directory, rowcount returns).

Unlike CSV, JSONL round-trips nested types (arrays, structs) and nulls
without dialect options — no delimiter/quote/null-string ambiguity. At
scale the directory-of-parts form is the only sane one: gzip JSONL is
non-splittable, so one .jsonl.gz = one task on read (same caveat as the
reference's gzip CSV, SURVEY.md §4.1).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

__all__ = ["df_to_jsonl", "read_jsonl", "query_to_jsonl"]

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def df_to_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    single_file: bool = False,
) -> tuple[str, int]:
    """Write a DataFrame as JSON-lines. Returns ``(path, rowcount)``.

    The default (directory of part files, one per task) is the scalable
    path; ``single_file=True`` mirrors the reference's one-file contract
    via coalesce(1). The rowcount is observed on the write pass — the
    source plan executes once.
    """
    if compression not in (None, "gzip"):
        raise ValueError(f"unsupported compression: {compression!r}")
    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows_written"))
    out_df = observed.coalesce(1) if single_file else observed
    tmp_dir = path + "._spark_tmp" if single_file else path
    writer = (
        out_df.write.mode("overwrite")
        .option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_FMT)
        .option("ignoreNullFields", "false")  # explicit nulls: lossless schema
    )
    if compression == "gzip":
        writer = writer.option("compression", "gzip")
    writer.json(tmp_dir)
    n = int(obs.get["rows_written"])
    if single_file:
        parts = glob.glob(os.path.join(tmp_dir, "part-*"))
        if len(parts) != 1:  # pragma: no cover - coalesce(1) guarantees one
            raise RuntimeError(f"expected one part file, found {parts}")
        if os.path.exists(path):
            os.remove(path)
        shutil.move(parts[0], path)
        shutil.rmtree(tmp_dir)
    return path, n


def query_to_jsonl(
    spark: SparkSession,
    sql: str,
    path: str,
    parameters: dict | None = None,
    compression: str | None = None,
    single_file: bool = False,
) -> tuple[str, int]:
    """Run ``sql`` (named ``:param`` binding) and export the result as JSONL."""
    from airflow_postgres_csv_spark.operators.etl import resolve_sql

    df = spark.sql(resolve_sql(sql), args=parameters or {})
    return df_to_jsonl(df, path, compression=compression, single_file=single_file)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read JSONL (gzip auto-detected from ``.gz``).

    Always pass ``schema`` in production: schema inference reads the data
    twice and widens types unpredictably across corpora shards.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(f"JSONL file not found: {path}")
    reader = spark.read.option("timestampFormat", _TS_FMT).option(
        "timestampNTZFormat", _TS_FMT
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
