"""UDF/UDAF surface (SURVEY.md §2.3 last row): the Arrow-vectorized Python
extension points, demonstrated with *exactly replayable* kernels.

The reference's extension story is "write any SQL" (delegated to Postgres,
operators.py:45); Spark's is the UDF matrix. The grouped-map
(``applyInPandas``) and iterator (``mapInPandas``) shapes are exercised by
the packing/chunking/multimodal operators; this module covers the rest —
**scalar pandas_udf**, **grouped-agg pandas_udf**, **cogrouped-map
applyInPandas**, and **mapInArrow** (raw RecordBatch iterator) — as
oracle-checked queries, completing the Arrow extension-point matrix.

Determinism: both kernels compute in ``numpy int64`` only (no float
accumulation), so results are bit-identical to the DuckDB integer-SQL
replay regardless of Arrow batch boundaries or partitioning. Row-at-a-time
``F.udf`` is deliberately absent from every query path — it is 10-100×
slower than Arrow batches and the engine treats it as a test-only surface.

The udfs are built lazily inside each query function because
``pandas_udf`` resolves its return-type DDL against the active session —
a module-import-time decorator would pin registration to session startup
order.

100 TB notes: scalar pandas_udfs stream Arrow batches executor-side (no
driver involvement, no shuffle); the grouped-agg UDAF shuffles once on the
group key like any hash aggregate, but WITHOUT partial aggregation — the
whole group's column reaches one task. That loss of map-side combine is
the real cost of leaving the JVM, which is why the docstring of each query
names the built-in expression that would replace it in production.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import t


def _udf_pandas_scalar(spark, sf_dir):
    # Scalar pandas_udf: a vectorized integer hash-fold over two columns.
    # Production equivalent: the same expression with built-in bitwise ops —
    # the UDF exists to certify the Arrow scalar path end-to-end.
    @pandas_udf(LongType())
    def fold_score(n_chars: pd.Series, doc_id: pd.Series) -> pd.Series:
        x = n_chars.astype("int64") * 2654435761 % 2147483647
        return (x + doc_id.astype("int64") * 97) % 999983

    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", "n_chars", fold_score("n_chars", "doc_id").alias("score"))
        .orderBy("doc_id")
    )


register(
    "udf_pandas_scalar",
    """
    SELECT doc_id, n_chars,
           ((n_chars * 2654435761) % 2147483647 + doc_id * 97) % 999983 AS score
    FROM documents ORDER BY doc_id
    """,
)(_udf_pandas_scalar)


def _udaf_pandas_grouped(spark, sf_dir):
    # Grouped-agg pandas_udf (UDAF): exact integer second moment per
    # language. Production equivalent: SUM(n_chars*n_chars) — a JVM
    # hash-agg WITH partial aggregation; the UDAF form ships each group's
    # full column to one task.
    # Spark forbids mixing grouped-agg pandas UDFs with JVM aggregates in
    # one agg(), so n_docs is a second pandas aggregate.
    @pandas_udf(LongType())
    def sum_sq(n_chars: pd.Series) -> int:
        v = n_chars.astype("int64")
        return int((v * v).sum())

    @pandas_udf(LongType())
    def n_rows(n_chars: pd.Series) -> int:
        return int(len(n_chars))

    return (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            sum_sq("n_chars").alias("sum_sq_chars"),
            n_rows("n_chars").alias("n_docs"),
        )
        .orderBy("lang")
    )


register(
    "udaf_pandas_grouped",
    """
    SELECT lang, CAST(SUM(n_chars * n_chars) AS BIGINT) AS sum_sq_chars, COUNT(*) AS n_docs
    FROM documents GROUP BY lang ORDER BY lang
    """,
)(_udaf_pandas_grouped)


def _udf_cogroup_reconcile(spark, sf_dir):
    # Cogrouped-map applyInPandas — the last Arrow UDF shape: both sides
    # shuffle on the key (exactly like the sort-merge join that replaces
    # it in production), then each key's two pandas frames reach one
    # task. Kernel: per-order reconciliation of the order header against
    # its lineitems, all arithmetic in int64 "cents" (ext*100 and
    # (1-disc)*100 are exact 2-decimal scalings, so np.rint is lossless
    # and the revenue unit is 1e-4 currency — bit-identical to the
    # integer-SQL replay regardless of Arrow batch boundaries).
    # Production equivalent: a join + groupBy with decimal sums.
    import numpy as np

    def reconcile(key, orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame) -> pd.DataFrame:
        (orderkey,) = key
        total_cents = (
            int(np.rint(orders_pdf["o_totalprice"].iloc[0] * 100))
            if len(orders_pdf)
            else -1
        )
        ext_c = np.rint(lines_pdf["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc_c = np.rint((1.0 - lines_pdf["l_discount"].to_numpy()) * 100).astype(
            "int64"
        )
        return pd.DataFrame(
            {
                "o_orderkey": [orderkey],
                "o_total_cents": [total_cents],
                "n_lines": [len(lines_pdf)],
                "rev_e4": [int((ext_c * disc_c).sum())],
            }
        )

    # Deterministic 10% key slice: the cogroup's cost is per-group Python
    # dispatch (one pandas frame pair per key), so the demo keeps the full
    # shuffle/cogroup shape but bounds the group count. Both filters push
    # down to the parquet scans.
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    lines = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        orders.groupBy("o_orderkey")
        .cogroup(lines.groupBy("l_orderkey"))
        .applyInPandas(
            reconcile,
            "o_orderkey long, o_total_cents long, n_lines long, rev_e4 long",
        )
        .orderBy("o_orderkey")
    )


register(
    "udf_cogroup_reconcile",
    """
    SELECT o.o_orderkey,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS o_total_cents,
           COUNT(l.l_orderkey) AS n_lines,
           CAST(COALESCE(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                        * CAST(CAST(1 - l.l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)),
                    0) AS BIGINT) AS rev_e4
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey % 10 = 0
    GROUP BY o.o_orderkey, o.o_totalprice
    ORDER BY o.o_orderkey
    """,
)(_udf_cogroup_reconcile)


def _udf_map_in_arrow(spark, sf_dir):
    # mapInArrow — the rawest Arrow extension point: the kernel sees
    # pyarrow RecordBatches directly (no pandas conversion), which is the
    # shape zero-copy columnar libraries (tokenizers, codecs) plug into.
    # Kernel: int64-only arithmetic on the batch arrays, so results are
    # bit-identical to the SQL replay regardless of batch boundaries.
    # Production equivalent: the same projection as JVM expressions.
    import pyarrow as pa

    def score_batches(it):
        for batch in it:
            n_chars = batch.column("n_chars").cast(pa.int64())
            doc_id = batch.column("doc_id").cast(pa.int64())
            import pyarrow.compute as pc

            score = pc.add(
                pc.multiply(n_chars, pa.scalar(1315423911, pa.int64())),
                pc.multiply(doc_id, pa.scalar(2654435761, pa.int64())),
            )
            yield pa.RecordBatch.from_arrays(
                [doc_id, pc.bit_wise_and(score, pa.scalar((1 << 40) - 1, pa.int64()))],
                ["doc_id", "score40"],
            )

    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .mapInArrow(score_batches, "doc_id long, score40 long")
        .orderBy("doc_id")
    )


register(
    "udf_map_in_arrow",
    """
    SELECT doc_id,
           (n_chars * 1315423911 + doc_id * 2654435761) & 1099511627775 AS score40
    FROM documents ORDER BY doc_id
    """,
)(_udf_map_in_arrow)


def _udtf_chunk_spans(spark, sf_dir):
    # Python UDTF (Spark 4 user-defined TABLE function): one input row →
    # N output rows, consumed through a SQL LATERAL join. The kernel emits
    # fixed-stride character spans per document — pure integer arithmetic,
    # so the DuckDB generate_series oracle replays it exactly. Production
    # equivalent (JVM-side, no Python): explode(sequence(0, ...)) with the
    # same least() arithmetic — the UDTF exists to certify the table-
    # function extension point end-to-end (registration, lateral
    # correlation, multi-row emission, schema contract).
    from pyspark.sql.functions import udtf

    size, step = 100, 80  # 20-char overlap between consecutive spans

    @udtf(returnType="doc_id bigint, span_id int, span_start bigint, span_end bigint")
    class ChunkSpans:
        def eval(self, doc_id: int, n_chars: int):
            k = 0
            while k * step < (n_chars or 0):
                yield doc_id, k, k * step, min(k * step + size, n_chars)
                k += 1

    spark.udtf.register("chunk_spans", ChunkSpans)
    view = "docs_udtf_src"
    t(spark, sf_dir, "documents").select("doc_id", "n_chars").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT s.doc_id, s.span_id, s.span_start, s.span_end
        FROM {view} d, LATERAL chunk_spans(d.doc_id, d.n_chars) s
        ORDER BY s.doc_id, s.span_id
        """
    )


register(
    "udtf_chunk_spans",
    """
    SELECT doc_id,
           CAST(k AS INT) AS span_id,
           k * 80 AS span_start,
           LEAST(k * 80 + 100, n_chars) AS span_end
    FROM documents,
         unnest(generate_series(0, CAST(CEIL(n_chars / 80.0) AS BIGINT) - 1)) t(k)
    ORDER BY doc_id, span_id
    """,
)(_udtf_chunk_spans)
