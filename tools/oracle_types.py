"""List oracle output columns whose DuckDB type would break the driver's
pandas canonicalizer: HUGEINT/UHUGEINT (fetch as float64 while Spark sends
int64 → hash mismatch) and LIST/STRUCT/MAP (unhashable in sort_values →
driver ERR). Pure DuckDB typing — no Spark, no data scan (LIMIT 0 prepare).

Usage: python -m tools.oracle_types [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

from airflow_postgres_csv_spark.catalog import TABLES
from airflow_postgres_csv_spark.queries import registry

BAD_EXACT = {"HUGEINT", "UHUGEINT"}
BAD_PREFIX = ("STRUCT", "MAP")


def bad_columns(con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple[str, str]]:
    rel = con.sql(sql)
    out = []
    for name, typ in zip(rel.columns, rel.types):
        s = str(typ)
        if s in BAD_EXACT or s.endswith("[]") or s.startswith(BAD_PREFIX):
            out.append((name, s))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )
    n_bad = 0
    for name, rq in sorted(registry().items()):
        if rq.oracle is None:
            continue
        try:
            bad = bad_columns(con, rq.oracle)
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if bad:
            print(f"BAD   {name}: " + ", ".join(f"{c}:{t}" for c, t in bad))
            n_bad += 1
    print(f"\n{n_bad} queries with driver-breaking oracle column types")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
