"""Local differential verifier — mimics the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, column names, and an
order-insensitive value comparison (exact for ints/strings, exact-or-tiny-
epsilon report for floats so we can see *how* far off a mismatch is).

Usage:
    python -m tools.verify_local [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

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


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bool):
        return int(v)
    return v


def _sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(name: str, spark_cols, spark_rows, duck_cols, duck_rows) -> list[str]:
    problems = []
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if problems:
        return problems
    a = _sorted_rows(spark_cols, spark_rows)
    b = _sorted_rows(duck_cols, duck_rows)
    n_diff = 0
    max_rel = 0.0
    example = None
    for ra, rb in zip(a, b):
        if ra == rb:
            continue
        for va, vb in zip(ra, rb):
            if va == vb:
                continue
            if isinstance(va, float) and isinstance(vb, float):
                rel = abs(va - vb) / max(abs(va), abs(vb), 1e-300)
                max_rel = max(max_rel, rel)
            n_diff += 1
            if example is None:
                example = (ra, rb)
    if n_diff:
        problems.append(
            f"{n_diff} differing cells (max float rel err {max_rel:.2e}); "
            f"example spark={example[0]} duck={example[1]}"
        )
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
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if rq.oracle is None:
            ok = len(spark_rows) >= 0
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(rq.oracle)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_cols, spark_rows, duck_cols, duck_rows)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(spark_rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
