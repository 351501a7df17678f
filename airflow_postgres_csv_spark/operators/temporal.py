"""Temporal joins Spark lacks as built-ins: as-of join and range join.

The reference delegates all SQL to Postgres (reference operators.py:80),
where users can express these with LATERAL / correlated subqueries; at
100 TB neither a correlated subquery nor a naive inequality join
survives, so both operators here are re-architected around a single
equi-shuffle:

- ``asof_join`` — the classic union+window formulation: tag both sides,
  union, sort each key group once by time, and carry the last-seen right
  payload forward with ``last(ignorenulls)``. Cost = one shuffle on the
  key (identical to a sort-merge join) regardless of how many right rows
  precede each left row; the naive formulation (join on key + ``r.ts <=
  l.ts`` + argmax) explodes to O(|L|·|R|/keys) intermediate rows.
- ``bucketed_range_join`` — interval-overlap join turned into an
  equi-join on a time bucket: each interval explodes into the buckets it
  covers, each point maps to exactly one bucket, equi-join on bucket,
  then refine with the exact predicate. Turns the broadcast-nested-loop
  plan Catalyst would pick for a pure inequality join into a shuffled
  hash/sort-merge join that scales linearly. Bucket width should be on
  the order of the median interval length: wider buckets → fewer
  duplicate interval rows but more false candidate pairs to refine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "bucketed_range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    strict: bool = False,
    tolerance_us: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before it
    (``direction="backward"``, the default) or at-or-after it
    (``direction="forward"`` — pandas ``merge_asof(direction=...)``).

    ``strict=True`` excludes the equal-timestamp match (pandas
    ``allow_exact_matches=False``). ``tolerance_us`` nulls the match when
    the gap exceeds that many microseconds (pandas ``tolerance``).
    Right-side payload columns come back as ``asof_<name>``, null when no
    match. Right rows must be unique per (key, right_ts) for a
    deterministic result — pre-aggregate with ``max_by`` otherwise.
    Both directions cost the same single key-shuffle: the forward variant
    just flips the carry window (``first`` over the following frame
    instead of ``last`` over the preceding one).

    ``direction="nearest"`` (pandas parity) picks whichever of the
    backward/forward candidates is closer in absolute time, ties toward
    the backward match (pandas' rule). Cost: still ONE key-shuffle — the
    two carries are windows over the same partitioning (Spark plans one
    Exchange and two in-partition sorts, since strict-mode tie ordering
    differs per direction).
    """
    if direction == "nearest":
        return _asof_join_nearest(
            left, right, on, left_ts, right_ts, right_cols, strict, tolerance_us
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward, forward or nearest, got {direction!r}"
        )
    forward = direction == "forward"
    keys = [on] if isinstance(on, str) else list(on)
    # Order within a (key, ts) tie decides whether an equal-ts right row
    # is visible to the left row (i.e. lands inside the left row's carry
    # frame): backward-inclusive -> right first, backward-strict -> right
    # last; forward mirrors both.
    if forward:
        left_ord, right_ord = (1, 0) if strict else (0, 1)
    else:
        left_ord, right_ord = (0, 1) if strict else (1, 0)

    lhs = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__ord", F.lit(left_ord))
        .withColumn("__is_left", F.lit(True))
    )
    rhs = (
        right.select(
            *[F.col(k) for k in keys],
            F.col(right_ts).alias("__ts"),
            F.struct(
                F.col(right_ts).alias("__rts"),
                *[F.col(c) for c in right_cols],
            ).alias("__r"),
        )
        .withColumn("__ord", F.lit(right_ord))
        .withColumn("__is_left", F.lit(False))
    )
    # allowMissingColumns fills the other side's payload with NULLs — the
    # union is the only data movement; the window below reuses its sort.
    u = lhs.unionByName(rhs, allowMissingColumns=True)

    if forward:
        w = (
            Window.partitionBy(*keys)
            .orderBy("__ts", "__ord")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("__r", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy("__ts", "__ord")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("__r", ignorenulls=True).over(w)
    matched = u.withColumn("__m", carry).filter(F.col("__is_left"))

    gap_ok: Column = F.lit(True)
    if tolerance_us is not None:
        signed_gap = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__m.__rts"))
        gap_ok = (-signed_gap if forward else signed_gap) <= F.lit(tolerance_us)
    keep = F.col("__m").isNotNull() & gap_ok

    out = matched.select(
        *left.columns,
        *[
            F.when(keep, F.col(f"__m.{c}")).alias(f"asof_{c}")
            for c in ["__rts", *right_cols]
        ],
    ).withColumnRenamed("asof___rts", f"asof_{right_ts}")
    return out


def _asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    strict: bool,
    tolerance_us: int | None,
) -> DataFrame:
    """pandas ``merge_asof(direction="nearest")``: closest right row in
    absolute time, equidistant ties to the backward (at-or-before) match.

    Same union+window formulation as the directional variants, with BOTH
    carries computed in one pass. The per-direction tie orders (an
    equal-timestamp right row must sit inside the inclusive frame and
    outside the strict one, mirrored for forward) are two small ordinal
    columns, so the plan is one Exchange on the key and two sorts.
    """
    keys = [on] if isinstance(on, str) else list(on)
    # left/right ordinal per direction (see asof_join body for the rule)
    b_left, b_right = (0, 1) if strict else (1, 0)
    f_left, f_right = (1, 0) if strict else (0, 1)

    lhs = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__ob", F.lit(b_left))
        .withColumn("__of", F.lit(f_left))
        .withColumn("__is_left", F.lit(True))
    )
    rhs = (
        right.select(
            *[F.col(k) for k in keys],
            F.col(right_ts).alias("__ts"),
            F.struct(
                F.col(right_ts).alias("__rts"),
                *[F.col(c) for c in right_cols],
            ).alias("__r"),
        )
        .withColumn("__ob", F.lit(b_right))
        .withColumn("__of", F.lit(f_right))
        .withColumn("__is_left", F.lit(False))
    )
    u = lhs.unionByName(rhs, allowMissingColumns=True)

    wb = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__ob")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__of")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched = (
        u.withColumn("__mb", F.last("__r", ignorenulls=True).over(wb))
        .withColumn("__mf", F.first("__r", ignorenulls=True).over(wf))
        .filter(F.col("__is_left"))
    )
    gb = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__mb.__rts"))
    gf = F.unix_micros(F.col("__mf.__rts")) - F.unix_micros(F.col("__ts"))
    chosen = (
        F.when(F.col("__mb").isNull(), F.col("__mf"))
        .when(F.col("__mf").isNull(), F.col("__mb"))
        .when(gb <= gf, F.col("__mb"))  # tie -> backward (pandas rule)
        .otherwise(F.col("__mf"))
    )
    matched = matched.withColumn("__m", chosen)

    gap_ok: Column = F.lit(True)
    if tolerance_us is not None:
        gap = F.abs(
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__m.__rts"))
        )
        gap_ok = gap <= F.lit(tolerance_us)
    keep = F.col("__m").isNotNull() & gap_ok

    return matched.select(
        *left.columns,
        *[
            F.when(keep, F.col(f"__m.{c}")).alias(f"asof_{c}")
            for c in ["__rts", *right_cols]
        ],
    ).withColumnRenamed("asof___rts", f"asof_{right_ts}")


def bucketed_range_join(
    left: DataFrame,
    intervals: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Join points to every interval containing them: ``start <= ts < end``.

    Intervals may overlap (a point can match many). Each point lands in
    exactly one bucket, so the equi-join introduces no duplicate
    (point, interval) pairs — no post-distinct needed. ``extra_on``
    adds equi-key columns shared by both sides to the join.
    """
    us = F.lit(int(bucket_seconds) * 1_000_000)
    expl = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / us),
                # end is exclusive, but a point in end's bucket can still
                # precede it — keep that bucket as a candidate.
                F.floor(F.unix_micros(F.col(end_col)) / us),
            )
        ),
    )
    pts = left.withColumn("__b", F.floor(F.unix_micros(F.col(left_ts)) / us))
    on = ["__b", *(extra_on or [])]
    return (
        pts.join(expl, on=on)
        .where(
            (F.col(left_ts) >= F.col(start_col)) & (F.col(left_ts) < F.col(end_col))
        )
        .drop("__b")
    )
