"""Sequence packing: greedy binning of chunks into token-budget sequences.

The step between chunking and training-batch assembly: concatenate chunks
(in a deterministic order) into sequences of at most ``budget`` tokens,
opening a new sequence when the next chunk would overflow. Inherently
sequential per group, so it runs as an Arrow-batched grouped-map
(``applyInPandas``) — one linear pandas pass per pack group, no Python
row loop over the driver.

Scale notes (100 TB): parallelism = number of pack groups; pick a group
key with enough cardinality (hash bucket of doc_id, shard id, ...) that
each group's chunks fit one executor's memory. Packing never crosses
groups, so results are reproducible regardless of cluster layout. The
single shuffle is the groupBy exchange; within a group the pandas pass is
O(n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Assign each chunk a ``seq_id`` (sequence number within its group)
    and ``seq_offset`` (token offset within that sequence).

    Greedy first-fit in ``order_cols`` order: a chunk opens a new sequence
    iff the current one is non-empty and adding it would exceed
    ``budget``. A chunk larger than the budget occupies a sequence alone.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("seq_id", LongType()), StructField("seq_offset", LongType())]
    )

    def pack(pdf):
        pdf = pdf.sort_values(order_cols).reset_index(drop=True)
        fill, seq_id = 0, 0
        seqs, offs = [], []
        for tk in pdf[tokens_col].tolist():
            tk = int(tk)
            if fill > 0 and fill + tk > budget:
                seq_id += 1
                fill = 0
            seqs.append(seq_id)
            offs.append(fill)
            fill += tk
        pdf["seq_id"] = seqs
        pdf["seq_offset"] = offs
        return pdf

    return df.groupBy(group_col).applyInPandas(pack, out_schema)
