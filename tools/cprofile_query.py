"""cProfile one registry query's driver-side Python work.

    python -m tools.cprofile_query pipeline_snapshot_medallion [sort] [topn]

Separates py4j socket wait (JVM work) from real Python driver work
(json/manifest I/O, pyarrow footer reads, file staging).
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    name = sys.argv[1]
    sort = sys.argv[2] if len(sys.argv) > 2 else "cumulative"
    topn = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from airflow_postgres_csv_spark.catalog import TABLES, load
    from airflow_postgres_csv_spark.queries import registry
    from airflow_postgres_csv_spark.session import get_spark

    reg = registry()
    spark = get_spark("cprofile")
    for tbl in TABLES:
        load(spark, sf_dir, tbl).count()
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    prof = cProfile.Profile()
    prof.enable()
    reg[name].fn(spark, sf_dir).count()
    prof.disable()
    st = pstats.Stats(prof)
    st.sort_stats(sort).print_stats(topn)


if __name__ == "__main__":
    main()
