"""Capture `.explain("formatted")` for registry queries into plans/<round>/
(round from $SPARK_GRAFT_PLANS, default r12).

    python -m tools.capture_plan before q1_pricing_summary graph_kcore ...
    python -m tools.capture_plan after  q1_pricing_summary

Writes plans/r11/<query>_<tag>.txt.  Note: building a query's DataFrame may
run its harness side effects (snapshot commits, index builds); only the
FINAL DataFrame's physical plan is captured, which is what the bench times
with its terminal count().
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

OUT_DIR = os.path.join(_REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS", "r12"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT_DIR, exist_ok=True)

    from airflow_postgres_csv_spark.queries import registry
    from airflow_postgres_csv_spark.session import get_spark

    reg = registry()
    spark = get_spark("capture-plan")
    for name in names:
        if name not in reg:
            print(f"SKIP unknown {name}", file=sys.stderr)
            continue
        df = reg[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
