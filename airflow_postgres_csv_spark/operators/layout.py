"""Space-filling-curve data layout: multi-column clustering for scan pruning.

Single-column sort layouts give zone-map pruning on one predicate column
only; interleaving the bits of N key columns gives a space-filling curve
where rows close in ANY dimension land close on disk, so min/max file
statistics prune scans on every clustered predicate — the layout behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` and Databricks liquid clustering.
No reference analog (the reference delegates layout to Postgres heap
storage); this is the engine-side equivalent for parquet lakes at 100 TB.

Both curves are pure Column expressions (no UDF, no shuffle): the
intended use is ``df.repartitionByRange(N, curve(...))
.sortWithinPartitions(...)`` before a parquet write (what
``snapshot_compact(zorder_by=...)`` does); ``zorder_extents`` summarizes
per-bucket min/max extents of the dimensions — the zone-map a reader
would prune with.

The Morton value is a static n·bits-term bitwise tree (whole-stage
codegen). The Hilbert value is a per-bit fold (``F.aggregate`` over a
static step array) — NEVER an unrolled conditional-swap tree, whose size
would grow as 3^bits; n-dimensional post-processing binds intermediate
values through single-element higher-order-function lambdas so no
subexpression is re-evaluated O(n·bits) times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "zorder_extents", "hilbert_value", "max_curve_bits"]


def max_curve_bits(n_cols: int) -> int:
    """Largest per-column bit width whose interleave fits a signed long
    (n·bits ≤ 63): 31 for 2 columns, 21 for 3, 15 for 4, …"""
    return 63 // n_cols


def _check_curve_args(cols, bits: int) -> int:
    n = len(cols)
    if n < 2:
        raise ValueError(f"curve clustering needs >= 2 columns, got {n}")
    if bits < 1 or n * bits > 63:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} interleaved bits; "
            f"must be in [n, 63] (bits <= {max_curve_bits(n)} for {n} cols)"
        )
    return n


def zorder_value(*cols: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of N non-negative longs:
    bit i of column j lands at position ``n·i + j`` (for two columns:
    x→2i, y→2i+1, the classic 2-D Z-order)."""
    n = _check_curve_args(cols, bits)
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            b = F.shiftright(c.cast("long"), i).bitwiseAND(one)
            z = z.bitwiseOR(F.shiftleft(b, n * i + j))
    return z


def hilbert_value(*cols: Column, bits: int = 16) -> Column:
    """Hilbert-curve index of N coordinates on a (2^bits)^n grid — the
    space-filling curve behind Databricks liquid clustering, with strictly
    better locality than Morton: every pair of consecutive curve positions
    is a grid-NEIGHBOR (Morton jumps quadrant diagonals), so per-file
    extents are tighter boxes and n-D box scans skip more files.

    Two dimensions use the standard xy→d fold (one rotate-and-accumulate
    step per bit, MSB first). Three or more use Skilling's transform
    ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004):
    a per-bit-plane exchange/invert fold over the axes, then a Gray-code
    correction and the Morton interleave of the transposed result. Both
    are expressed as ``F.aggregate`` over a static step array — a
    sequential JVM fold, O(n) expression nodes per step, no UDF, no
    shuffle. Bijectivity + the neighbor property are pinned for both
    paths in tests/test_snapshots.py."""
    n = _check_curve_args(cols, bits)
    if n == 2:
        return _hilbert_2d(cols[0], cols[1], bits)
    return _hilbert_nd(cols, bits)


def _hilbert_2d(x: Column, y: Column, bits: int) -> Column:
    steps = F.array(
        *[F.lit(1 << i).cast("long") for i in range(bits - 1, -1, -1)]
    )
    init = F.struct(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc: Column, s: Column) -> Column:
        ax, ay, ad = acc["x"], acc["y"], acc["d"]
        rx = F.when(ax.bitwiseAND(s) > 0, F.lit(1)).otherwise(0).cast("long")
        ry = F.when(ay.bitwiseAND(s) > 0, F.lit(1)).otherwise(0).cast("long")
        d2 = ad + s * s * ((F.lit(3).cast("long") * rx).bitwiseXOR(ry))
        # rotation: when ry==0, optionally flip (rx==1), then swap x/y
        nx = (
            F.when(ry == 0, F.when(rx == 1, s - 1 - ay).otherwise(ay))
            .otherwise(ax)
        )
        ny = (
            F.when(ry == 0, F.when(rx == 1, s - 1 - ax).otherwise(ax))
            .otherwise(ay)
        )
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    return F.aggregate(steps, init, step)["d"]


def _bind1(value: Column, fn) -> Column:
    """Evaluate ``value`` ONCE and pass it to ``fn`` as a bound lambda
    variable: ``transform(array(value), v -> fn(v))[1]``. Higher-order
    lambda variables are bound references, so ``fn`` may use ``v`` freely
    without re-evaluating ``value``'s subtree per reference (Catalyst
    duplicates — and interpreted HOF eval re-executes — repeated Column
    subtrees otherwise)."""
    return F.element_at(F.transform(F.array(value), fn), 1)


def _hilbert_nd(cols, bits: int) -> Column:
    n = len(cols)
    one = F.lit(1).cast("long")
    # Q = 2^(bits-1) .. 2: the bit-plane loop of Skilling's
    # AxesToTranspose, expressed as one fold step per plane.
    qs = F.array(*[F.lit(1 << j).cast("long") for j in range(bits - 1, 0, -1)])
    init = F.struct(
        *[c.cast("long").alias(f"x{i}") for i, c in enumerate(cols)]
    )

    def q_step(acc: Column, q: Column) -> Column:
        p = q - 1
        x0 = acc["x0"]
        rest: list[Column] = []
        # axis 0: t = (x0 ^ x0) & p = 0, so only the invert branch acts
        x0 = F.when(x0.bitwiseAND(q) > 0, x0.bitwiseXOR(p)).otherwise(x0)
        for i in range(1, n):
            xi = acc[f"x{i}"]
            # when bit Q of X[i] is set, Skilling inverts X[0] (not X[i]);
            # otherwise the low bits of X[0] and X[i] are exchanged where
            # they differ (swap = 0 in the invert branch).
            swap = F.when(xi.bitwiseAND(q) > 0, F.lit(0).cast("long")).otherwise(
                (x0.bitwiseXOR(xi)).bitwiseAND(p)
            )
            nx0 = F.when(xi.bitwiseAND(q) > 0, x0.bitwiseXOR(p)).otherwise(
                x0.bitwiseXOR(swap)
            )
            nxi = F.when(xi.bitwiseAND(q) > 0, xi).otherwise(
                xi.bitwiseXOR(swap)
            )
            rest.append(nxi)
            x0 = nx0
        return F.struct(
            x0.alias("x0"), *[c.alias(f"x{i + 1}") for i, c in enumerate(rest)]
        )

    folded = F.aggregate(qs, init, q_step)

    def post(s: Column) -> Column:
        # Gray-code correction on the transposed axes
        g = [s["x0"]]
        for i in range(1, n):
            g.append(s[f"x{i}"].bitwiseXOR(g[i - 1]))
        t_val = F.aggregate(
            qs,
            F.lit(0).cast("long"),
            lambda acc, q: F.when(
                g[n - 1].bitwiseAND(q) > 0, acc.bitwiseXOR(q - 1)
            ).otherwise(acc),
        )

        def interleave(tv: Column) -> Column:
            d = F.lit(0).cast("long")
            for j in range(bits):
                for i in range(n):
                    b = F.shiftright(g[i].bitwiseXOR(tv), j).bitwiseAND(one)
                    d = d.bitwiseOR(F.shiftleft(b, j * n + (n - 1 - i)))
            return d

        return _bind1(t_val, interleave)

    return _bind1(folded, post)


def zorder_extents(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    bits: int = 16,
    bucket_bits: int = 6,
) -> DataFrame:
    """Per-z-bucket zone-map summary ``(bucket, n, min/max of both dims)``.

    Buckets are the top ``bucket_bits`` bits of the z-value (2^bucket_bits
    files in a real write). Tight per-bucket extents on BOTH columns are
    the property that makes predicate-driven file skipping work.
    """
    z = zorder_value(F.col(x_col), F.col(y_col), bits=bits)
    bucket = F.shiftright(z, 2 * bits - bucket_bits)
    return (
        df.select(
            bucket.alias("bucket"),
            F.col(x_col).alias("_x"),
            F.col(y_col).alias("_y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_x").alias("min_x"),
            F.max("_x").alias("max_x"),
            F.min("_y").alias("min_y"),
            F.max("_y").alias("max_y"),
        )
    )
