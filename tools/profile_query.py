"""Per-job profiler for bench queries (guide §1: measure first).

Runs the named registry queries exactly the way bench.py does (same session
defaults + one warmup pass), with Spark event logging enabled, then parses
the event log to attribute every Spark job (duration, #stages, shuffle
bytes, task time) to the query that submitted it.  Output: per-query wall
seconds + the job-level breakdown that tells you WHERE the time goes —
harness commits, index builds, convergence collects, or the final count.

Usage:
    python -m tools.profile_query q1_pricing_summary graph_kcore ...
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python -m tools.profile_query --top 12

Flags:
    --reps N     times each query N times, reports min (default 1 — profiling
                 wants the job breakdown, not the steady-state min)
    --json PATH  also dump the per-query job table as JSON
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

EVENT_DIR = "/tmp/spark-events-profile"


def _mk_session():
    os.makedirs(EVENT_DIR, exist_ok=True)
    from airflow_postgres_csv_spark.session import get_spark

    return get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVENT_DIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )


def _event_lines(app_id: str):
    path = os.path.join(EVENT_DIR, app_id)
    v2 = os.path.join(EVENT_DIR, f"eventlog_v2_{app_id}")
    if os.path.isdir(v2):
        for part in sorted(os.listdir(v2)):
            if part.startswith("events_"):
                with open(os.path.join(v2, part)) as fh:
                    yield from fh
        return
    if not os.path.exists(path):  # .inprogress until stop()
        path += ".inprogress"
    with open(path) as fh:
        yield from fh


def _parse_jobs(app_id: str) -> list[dict]:
    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    if True:
        for line in _event_lines(app_id):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "job": jid,
                    "t0": ev["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "stages": len(ev.get("Stage IDs", [])),
                    "tasks": 0,
                    "task_ms": 0,
                    "shuf_w": 0,
                    "shuf_r": 0,
                    "input": 0,
                }
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif kind == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                jid = stage_to_job.get(si["Stage ID"])
                if jid is not None and jid in jobs:
                    jobs[jid]["tasks"] += si.get("Number of Tasks", 0)
    return [j for j in jobs.values() if "t1" in j]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 1
    json_out = None
    top_n = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--json":
            json_out = args[i + 1]; i += 2
        elif args[i] == "--top":
            top_n = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from airflow_postgres_csv_spark.queries import registry

    reg = registry()
    if top_n:
        import bench

        names = bench.HEADLINE[:top_n] if not names else names
    unknown = [n for n in names if n not in reg]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    spark = _mk_session()
    app_id = spark.sparkContext.applicationId

    # warmup exactly like bench.py
    from airflow_postgres_csv_spark.catalog import TABLES, load

    for tbl in TABLES:
        load(spark, sf_dir, tbl).count()
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    spans: dict[str, list[tuple[float, float, float]]] = {}
    for name in names:
        best = None
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"[{name}#rep{r}]")
            t0 = time.time()
            df = reg[name].fn(spark, sf_dir)
            df.count()
            t1 = time.time()
            spark.sparkContext.setJobDescription(None)
            spans.setdefault(name, []).append((t0 * 1000, t1 * 1000, t1 - t0))
            best = (t1 - t0) if best is None else min(best, t1 - t0)
        print(f"== {name}: best {best:.2f}s over {reps} rep(s)")

    spark.stop()
    time.sleep(1.0)
    jobs = _parse_jobs(app_id)

    report: dict[str, dict] = {}
    for name, reps_spans in spans.items():
        # profile the FIRST rep (cold-ish) — breakdown, not steady-state
        t0, t1, wall = reps_spans[0]
        mine = [j for j in jobs if t0 <= j["t0"] <= t1]
        mine.sort(key=lambda j: -(j["t1"] - j["t0"]))
        tot_job = sum(j["t1"] - j["t0"] for j in mine) / 1000.0
        print(f"\n### {name}  wall={wall:.2f}s  jobs={len(mine)}  "
              f"sum(job wall)={tot_job:.2f}s  gap={wall - tot_job:.2f}s")
        for j in mine[:14]:
            d = (j["t1"] - j["t0"]) / 1000.0
            desc = (j["desc"] or "")[:90]
            print(f"  {d:7.2f}s  job {j['job']:>4}  stages={j['stages']:<3} "
                  f"tasks={j['tasks']:<5} {desc}")
        report[name] = {
            "wall": wall,
            "n_jobs": len(mine),
            "sum_job_wall": tot_job,
            "gap": wall - tot_job,
            "jobs": [
                {
                    "dur_s": (j["t1"] - j["t0"]) / 1000.0,
                    "stages": j["stages"],
                    "tasks": j["tasks"],
                    "desc": j["desc"],
                }
                for j in mine
            ],
        }
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"\nwrote {json_out}")


if __name__ == "__main__":
    main()
