"""Frequent-items (heavy hitters) via per-partition Misra-Gries summaries.

The built-in sketch families (HLL distinct, theta set-algebra, KLL
quantiles) are registered in queries/functions_sql.py on Spark's
DataSketches functions; Spark has no frequent-items sketch, so this
operator supplies the missing member with the classic two-pass shape:

1. **Candidate pass (map-side only, no shuffle):** each partition folds its
   rows through a Misra-Gries summary of capacity ``c = ceil(1/ratio)``.
   MG undercounts any item by at most ``n_p / c`` within a partition, and
   the error is additive across partitions, so every item with global
   frequency > n·ratio survives in at least one partition's summary —
   candidate recall is GUARANTEED, not probabilistic (Misra & Gries 1982;
   mergeability per Agarwal et al., "Mergeable Summaries", PODS'12).
2. **Exact pass:** one filtered hash-agg counts ONLY the candidates
   (semi-join on the collected candidate set — bounded by c · #partitions,
   metadata-sized) and keeps those with exact count > n·ratio.

Output is therefore EXACT heavy hitters with exact counts — which is what
makes the operator differential-testable against a plain GROUP BY/HAVING
oracle — while scan cost stays two passes and the only shuffle is the
final ≤ c·P-row aggregation.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "heavy_hitters",
    "cms_sketch",
    "cms_estimate",
    "bloom_build",
    "bloom_might_contain",
]


def _mg_fold(values: Iterator[pd.Series], capacity: int) -> dict:
    """Fold a partition's values through a Misra-Gries summary."""
    counters: dict = {}
    for chunk in values:
        for v in chunk:
            if v in counters:
                counters[v] += 1
            elif len(counters) < capacity:
                counters[v] = 1
            else:
                # decrement-all step; drop zeros
                dead = []
                for k in counters:
                    counters[k] -= 1
                    if counters[k] == 0:
                        dead.append(k)
                for k in dead:
                    del counters[k]
    return counters


def heavy_hitters(df: DataFrame, col: str, min_freq_ratio: float) -> DataFrame:
    """Items of ``col`` with frequency > ``min_freq_ratio`` of the rows,
    with EXACT counts: (``item``, ``freq``).

    ``min_freq_ratio`` bounds summary size: capacity is ceil(1/ratio) per
    partition, so a 0.001 ratio costs 1000 counters per task regardless of
    data volume.
    """
    if not 0.0 < min_freq_ratio < 1.0:
        raise ValueError("min_freq_ratio must be in (0, 1)")
    capacity = math.ceil(1.0 / min_freq_ratio)

    def _partition_summary(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = _mg_fold((b[col] for b in batches), capacity)
        yield pd.DataFrame({col: list(counters.keys())})

    item_type = df.schema[col].dataType.simpleString()
    candidates = (
        df.select(col)
        .mapInPandas(_partition_summary, f"{col} {item_type}")
        .distinct()
    )
    total = df.select(F.count(F.lit(1)).alias("_n"))
    return (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .join(F.broadcast(total))
        .where(F.col("freq") > F.col("_n") * F.lit(min_freq_ratio))
        .select(F.col(col).alias("item"), "freq")
    )


# ---------------------------------------------------------------------------
# Count-min sketch as a RELATION. Spark's count_min_sketch() aggregate emits
# an opaque binary blob with no SQL-side estimator, so instead the sketch
# here IS a DataFrame of (depth_row, bucket, cnt) counters — the d×w counter
# matrix in relational form (Cormode & Muthukrishnan 2005). That makes it:
#
# - **mergeable** by construction: union two sketch relations and re-sum —
#   the per-partition/per-day rollup path a 100 TB pipeline needs;
# - **bounded**: at most d·w rows regardless of input size (the groupBy is
#   a map-side-combinable sum onto d·w cells);
# - **differential-testable**: bucket assignment is md5-based and replayed
#   bit-identically in the DuckDB oracle, so estimates (not just error
#   bounds) are EXACT-comparable across engines.
#
# Estimation joins a (small, broadcast) key set against the sketch on
# (depth_row, bucket) and takes min(cnt) per key — the classic CMS read,
# expressed as an equi-join + groupBy.
# ---------------------------------------------------------------------------


def _cms_bucket(key, row: int, width: int):
    """Bucket of ``key`` for hash row ``row``: first 8 md5 hex digits of
    ``'row:key'`` mod width. 32 hash bits over a ≤2^16 width keeps the
    modulo bias < 2^-16 — immaterial for counter placement."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(str(row)), key)), 1, 8), 16, 10)
    return (h.cast("long") % width).cast("int")


def cms_sketch(df: DataFrame, col: str, depth: int = 4, width: int = 256) -> DataFrame:
    """Build a count-min sketch of ``col`` as a (depth_row, bucket, cnt)
    relation with ``depth`` hash rows and ``width`` buckets per row.

    Guarantees (per CMS): for any key, estimate >= true count, and with
    probability 1 - (1/2)^depth, estimate <= true count + 2n/width.
    One wide-then-narrow aggregation: rows explode ×depth map-side, then
    hash-aggregate onto at most depth·width cells (partial aggregation
    makes the shuffle metadata-sized).
    """
    if depth < 1 or width < 2 or width > 65536:
        raise ValueError("cms_sketch: need depth >= 1 and 2 <= width <= 65536")
    key = F.col(col).cast("string")
    rows = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("depth_row"),
                    _cms_bucket(key, r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("_cell")
    )
    return rows.groupBy(
        F.col("_cell.depth_row").alias("depth_row"),
        F.col("_cell.bucket").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query the sketch relation for every key in ``keys[col]``:
    returns (col, est) with est = min over hash rows of the key's bucket
    counter. ``depth``/``width`` must match the build call.

    The sketch side is broadcast (it is at most depth·width rows by
    construction — counter state, not data). An EMPTY cell is a 0 counter:
    the probe left-joins the sketch and coalesces misses to 0, so a key
    the data never touched estimates 0, as CMS specifies — an inner join
    would drop the empty cell and silently take min over the others.
    """
    key = F.col(col).cast("string")
    probes = keys.select(
        F.col(col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("depth_row"),
                    _cms_bucket(key, r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("_cell"),
    ).select(col, "_cell.depth_row", "_cell.bucket")
    return (
        probes.join(F.broadcast(sketch), ["depth_row", "bucket"], "left")
        .select(col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy(col)
        .agg(F.min("cnt").alias("est"))
    )


# ---------------------------------------------------------------------------
# Bloom filter as a RELATION — same design decision as the CMS above:
# Spark's runtime row-level-filtering bloom functions are internal, so the
# filter here is a DataFrame of (word_idx, word) 64-bit words, built with a
# map-side-combinable bit_or aggregation. Mergeable (union + re-bit_or),
# bounded (ceil(m/64) rows), md5-replayable in the DuckDB oracle. The
# classic use is PRE-JOIN PRUNING: build the filter over the small side's
# keys, semi-check the big side against it before the shuffle — rows that
# fail (guaranteed non-matches) never enter the exchange; false positives
# only cost wasted shuffle, never wrong results.
# ---------------------------------------------------------------------------


def _bloom_bits(key, k_hashes: int, m_bits: int):
    """The k probe bit positions of ``key``: two independent 32-bit md5
    halves combined Kirsch-Mitzenmacher style (g_i = h1 + i*h2 mod m) — one
    digest per key for any k, the same trick the MinHash operator uses."""
    h = F.md5(key)
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return [((h1 + F.lit(i) * h2) % m_bits).alias(f"_bit_{i}") for i in range(k_hashes)]


def bloom_build(
    df: DataFrame, col: str, k_hashes: int = 4, m_bits: int = 4096
) -> DataFrame:
    """Build a Bloom filter of ``col`` as a (word_idx, word) relation:
    ``m_bits`` bits packed 63-per-long via bit_or aggregation (63, not
    64: DuckDB's checked ``<<`` overflows into the sign bit at 63 while
    Java's wraps — 63-bit words keep the oracle replay engine-identical).
    One explode (×k) + one map-side-combinable groupBy onto ≤ m/64 cells.
    """
    if m_bits < 63:
        raise ValueError("bloom_build: m_bits must be >= 63")
    key = F.col(col).cast("string")
    bit = F.explode(F.array(*_bloom_bits(key, k_hashes, m_bits))).alias("_bit")
    return (
        df.select(bit)
        .select(
            (F.col("_bit") / 63).cast("int").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit % 63 AS INT))").alias(
                "_mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_might_contain(
    df: DataFrame, bloom: DataFrame, col: str, k_hashes: int = 4, m_bits: int = 4096
) -> DataFrame:
    """Keep only rows of ``df`` whose ``col`` MIGHT be in the filter (all k
    probe bits set) — the pre-join pruning pass. Guarantees: no false
    negatives; false-positive rate ≈ (1 - e^{-k·n/m})^k.

    Shape: k sequential broadcast hash joins (the filter relation is
    ≤ m/64 rows of state), each checking one probe bit and FILTERING —
    row multiplicity is preserved exactly (no row identity needed, unlike
    a probe-explode + regroup), and each probe only sees the rows the
    previous probes let through, so most non-members die on the first
    broadcast lookup without ever shuffling.
    """
    out = df
    bits = _bloom_bits(F.col(col).cast("string"), k_hashes, m_bits)
    bloom = F.broadcast(
        bloom.select(F.col("word_idx").alias("_widx"), F.col("word").alias("_bword"))
    )
    for bit in bits:
        out = (
            out.withColumn("_bit", bit)
            .withColumn("_widx", (F.col("_bit") / 63).cast("int"))
            .withColumn(
                "_mask",
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit % 63 AS INT))"),
            )
            .join(bloom, "_widx", "left")
            .filter(
                F.coalesce(F.col("_bword"), F.lit(0)).bitwiseAND(F.col("_mask")) != 0
            )
            .drop("_bit", "_widx", "_mask", "_bword")
        )
    return out
