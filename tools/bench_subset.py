"""Time a subset of registry queries with bench.py's exact methodology
(same session, same warmup, min of 2-3 reps, count() action).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python -m tools.bench_subset q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from airflow_postgres_csv_spark.catalog import TABLES, load
    from airflow_postgres_csv_spark.queries import registry
    from airflow_postgres_csv_spark.session import get_spark

    reg = registry()
    if not names:
        print("usage: python -m tools.bench_subset <query> [query ...]",
              file=sys.stderr)
        sys.exit(2)
    unknown = [n for n in names if n not in reg]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark("bench-subset")
    for tbl in TABLES:
        load(spark, sf_dir, tbl).count()
    reg[names[0]].fn(spark, sf_dir).count()
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    timings = {}
    for name in names:
        best = None
        reps = 2
        i = 0
        while i < reps:
            i += 1
            t0 = time.time()
            reg[name].fn(spark, sf_dir).count()
            el = time.time() - t0
            best = el if best is None else min(best, el)
            if i == 2 and best > 2.0:
                reps = 3
        timings[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", file=sys.stderr)
    print(json.dumps({"queries": timings, "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
