"""Local differential verifier — mimics the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, column names, and an
order-insensitive value hash computed EXACTLY the way the driver does:

- the oracle side is fetched as a pandas frame via ``con.execute(sql).df()``
  (so DuckDB HUGEINT becomes float64, DATE becomes datetime64, …),
- the Spark side via ``DataFrame.toPandas()``,
- both frames are canonicalized (columns sorted by name, rows sorted by all
  columns) and hashed with ``pd.util.hash_pandas_object`` — which collapses
  integer widths (int32 vs int64 hash alike) but distinguishes int from
  float bit-patterns, the observed driver behavior (round-4 verdict: HUGEINT
  oracle columns → float64 → hash mismatch vs Spark int64, while Spark
  int32 ``row_number`` vs DuckDB BIGINT passed).

A LIST/STRUCT-typed output column makes ``sort_values`` raise — reported as
FAIL here, exactly as the driver records ``err``.

When hashes differ, a value-level diff (computed on Python objects like the
old verifier did) is printed so you can see whether it is a dtype skew
(values equal, dtypes differ) or a genuine value divergence.

Usage:
    python -m tools.verify_local [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd

from airflow_postgres_csv_spark.catalog import TABLES
from airflow_postgres_csv_spark.queries import registry
from airflow_postgres_csv_spark.session import get_spark


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-faithful canonicalization: columns sorted, rows sorted by all
    columns. Raises on unsortable (list/dict) cells like the driver does."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> np.ndarray:
    """Order-insensitive-enough hash: per-row uint64 from hash_pandas_object
    on the canonicalized frame. Two frames match iff the arrays are equal."""
    if not len(df.columns) or not len(df):
        return np.array([], dtype="uint64")
    return pd.util.hash_pandas_object(df, index=False).to_numpy()


def _norm_cell(v):
    """Value-level normalization for the diagnostic diff (NOT the gate)."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, np.floating):
        return _norm_cell(float(v))
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    return v


def _diff_report(a: pd.DataFrame, b: pd.DataFrame) -> str:
    """Explain a hash mismatch: dtype skews and/or value diffs."""
    parts = []
    for col in a.columns:
        if str(a[col].dtype) != str(b[col].dtype):
            parts.append(f"dtype[{col}] spark={a[col].dtype} duck={b[col].dtype}")
    n_diff = 0
    max_rel = 0.0
    example = None
    for col in a.columns:
        va_all = a[col].tolist()
        vb_all = b[col].tolist()
        for i, (va, vb) in enumerate(zip(va_all, vb_all)):
            va, vb = _norm_cell(va), _norm_cell(vb)
            if va == vb:
                continue
            if isinstance(va, float) and isinstance(vb, (float, int)):
                rel = abs(va - vb) / max(abs(va), abs(vb), 1e-300)
                max_rel = max(max_rel, rel)
            n_diff += 1
            if example is None:
                example = (col, i, va, vb)
    if n_diff:
        parts.append(
            f"{n_diff} differing cells (max float rel err {max_rel:.2e}); "
            f"example col={example[0]} row={example[1]} spark={example[2]!r} duck={example[3]!r}"
        )
    if not parts:
        parts.append("hash differs but no object-level diff found (bit-pattern skew)")
    return "; ".join(parts)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
    if problems:
        return problems
    a = canon(spark_pdf)
    b = canon(duck_pdf)
    ha, hb = value_hash(a), value_hash(b)
    if not np.array_equal(ha, hb):
        problems.append("value-hash mismatch: " + _diff_report(a, b))
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    reg = registry()
    spark = get_spark("verify-local")
    con = duck_con(sf_dir)
    n_pass = n_fail = n_rowsonly = 0
    for name, rq in sorted(reg.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = rq.fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if rq.oracle is None:
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            duck_pdf = con.execute(rq.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        try:
            problems = compare(spark_pdf, duck_pdf)
        except Exception as e:  # noqa: BLE001
            # e.g. list-typed output column → sort_values TypeError: the
            # driver records this as `err`, an automatic red row.
            problems = [f"canonicalizer error (driver would ERR): {type(e).__name__}: {e}"]
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
