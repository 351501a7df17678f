"""Metadata-only maintenance advisor for snapshot tables.

A 100 TB lakehouse table degrades along four independent axes — small
files accumulate (append cadence), merge-on-read tombstones stack up
(read-side anti-join cost), fresh commits arrive unclustered (scan
pruning decays), and superseded versions pin storage (expire debt).
Each has a maintenance op (``snapshot_compact``,
``snapshot_optimize_incremental``, ``snapshot_expire``); what an
operator loop needs is the DECISION — cheap enough to run every cycle
on thousands of tables.

``snapshot_maintenance_plan`` answers it from the ROOT MANIFEST alone:
every commit carries a ``commit_sizes`` rollup ``(n_files,
total_bytes, n_small @ small_bytes)`` and a ``sketch_commits``
membership stamped at publish time, so the default sweep is O(commits)
dict lookups — zero sidecar opens, zero per-file stat calls, no Spark
job. Only a NON-default ``target_bytes`` (the recorded small-file
threshold no longer matches) or a COW-partial commit (the rollup
describes the full original commit, not the retained subset) recounts
from that commit's sidecar ``bytes`` map — still O(affected commits)
JSON reads, never O(files) filesystem calls. Thresholds are
keyword-tunable; the defaults encode the usual lakehouse guidance
(files under ¼ of the target are "small"; more than a handful of
tombstones or unclustered commits warrants a cycle; more than
``max_versions`` retained manifests warrants an expire).

No reference analog (the reference delegates storage to Postgres;
/root/reference/src/airflow_postgres_csv/operators.py) — the
operational completion of the snapshot subsystem (SURVEY.md §2.3).
"""

from __future__ import annotations

import os

from airflow_postgres_csv_spark.operators.snapshots import (
    _SMALL_FILE_BYTES,
    _commit_files_from_sidecar,
    _commit_markers,
    _load_manifest,
    _load_sidecar,
    snapshot_versions,
)

__all__ = ["snapshot_maintenance_plan", "snapshot_table_stats"]


def _commit_size_triple(
    root: str, m: dict, cid: str, n: int, subset, small_thr: int
) -> tuple[int, int, int]:
    """``(n_files, total_bytes, n_small)`` for one pinned commit.

    Fast path: the root's ``commit_sizes`` rollup (full commits at the
    recorded threshold — zero I/O). A threshold mismatch keeps the
    rollup's file/byte totals and recounts ``n_small`` from the commit
    sidecar's per-file ``bytes`` map; a COW-partial commit recounts
    everything over exactly the retained subset. ``os.path.getsize`` is
    the legacy last resort for sidecars written before byte maps
    existed."""
    ent = (m.get("commit_sizes") or {}).get(cid)
    if subset is None and ent is not None and m.get("small_bytes") == small_thr:
        return int(ent[0]), int(ent[1]), int(ent[2])
    rels = subset if subset is not None else None
    bmap = _load_sidecar(root, m, cid).get("bytes") or {}
    if rels is None:
        rels = (
            list(bmap)
            if ent is not None and len(bmap) == n
            else _commit_files_from_sidecar(root, m, cid, n)
        )
    sizes = [
        bmap[rel] if rel in bmap else os.path.getsize(os.path.join(root, rel))
        for rel in rels
    ]
    return len(sizes), sum(sizes), sum(1 for s in sizes if s < small_thr)


def snapshot_maintenance_plan(
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
    max_tombstones: int = 4,
    max_unoptimized_commits: int = 8,
    max_versions: int = 32,
    max_branch_age_s: float = 7 * 24 * 3600,
) -> dict:
    """Inspect the latest manifest and recommend maintenance actions.

    Returns ``{"version", "metrics": {...}, "actions": [
    {"action", "reason"}, ...]}`` where ``action`` is one of
    ``compact`` (small-file debt or tombstone debt — a full clustered
    rewrite folds both), ``optimize_incremental`` (the table has a
    curve-clustered generation and enough unclustered newer commits to
    warrant a cycle), ``expire`` (retained version count beyond
    ``max_versions``), ``sketch_backfill`` (a sketch config is
    active but some commits predate it or were tombstone-invalidated —
    ``snapshot_compact`` re-sketches everything it rewrites), and
    ``drop_branches`` (WAP quarantine / abandoned transaction branches
    whose head commit is older than ``max_branch_age_s`` — they pin
    hardlinked data past every retention window until dropped; the
    action lists the stale names so the operator can triage-then-drop).
    An empty ``actions`` list means the table is healthy; the metrics
    are always returned so a fleet scheduler can apply its own policy.
    Branch inspection is O(branches) manifest reads — still metadata
    only, no Spark job, no data I/O."""
    import time as _time

    from airflow_postgres_csv_spark.operators.branches import (
        snapshot_branches,
    )
    versions = snapshot_versions(root)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {root}")
    m = _load_manifest(root, versions[-1])
    small_thr = target_bytes // 4
    tombs = m.get("tombstones", [])
    opt = set(m.get("optimized_commits", []))
    sort_order = m.get("sort_order")
    sorted_cids = set(m.get("sorted_commits", []))
    sketch_cols = (m.get("sketch") or {}).get("cols", [])
    sketch_rollup = m.get("sketch_commits")  # None only on legacy roots
    n_files = total_bytes = small = 0
    n_commits = unoptimized = unsorted = 0
    sketch_gap = 0
    tomb_cids: set = set()
    for t in tombs:
        if t.get("kind") == "positional":
            tomb_cids |= {r.split(os.sep)[1] for r in t["applies"]}
        else:
            tomb_cids |= set(t["commits"])
    for cid, n, subset in _commit_markers(root, m):
        n_commits += 1
        nf, tb, ns = _commit_size_triple(root, m, cid, n, subset, small_thr)
        n_files += nf
        total_bytes += tb
        small += ns
        if opt and cid not in opt:
            unoptimized += 1
        if sort_order and cid not in sorted_cids:
            unsorted += 1
        if sketch_cols:
            has = (
                cid in sketch_rollup
                if sketch_rollup is not None
                else bool(_load_sidecar(root, m, cid).get("sketches") or {})
            )
            if not has or subset is not None or cid in tomb_cids:
                sketch_gap += 1
    branches = snapshot_branches(root)
    now_ns = _time.time_ns()
    stale = sorted(
        name
        for name, info in branches.items()
        if (
            now_ns
            - _load_manifest(info["root"], info["head"]).get(
                "committed_at", now_ns
            )
        )
        > max_branch_age_s * 1e9
    )
    metrics = {
        "n_files": n_files,
        "total_bytes": total_bytes,
        "small_files": small,
        "n_tombstones": len(tombs),
        "n_commits": n_commits,
        "unoptimized_commits": unoptimized if opt else None,
        "unsorted_commits": unsorted if sort_order else None,
        "sketch_gap_commits": sketch_gap if sketch_cols else None,
        "retained_versions": len(versions),
        "n_branches": len(branches),
        "stale_branches": len(stale),
    }
    actions = []
    if n_files > 1 and small > n_files / 2:
        actions.append(
            {
                "action": "compact",
                "reason": f"{small}/{n_files} files under "
                f"{small_thr} bytes — small-file debt",
            }
        )
    elif len(tombs) >= max_tombstones:
        actions.append(
            {
                "action": "compact",
                "reason": f"{len(tombs)} merge-on-read tombstones — every "
                "read pays their anti-joins until a rewrite folds them",
            }
        )
    if opt and unoptimized >= max_unoptimized_commits:
        actions.append(
            {
                "action": "optimize_incremental",
                "reason": f"{unoptimized} commits arrived since the last "
                "optimize — scan pruning on the clustered columns is "
                "decaying for new data",
            }
        )
    if sort_order and unsorted >= max_unoptimized_commits:
        actions.append(
            {
                "action": "optimize_incremental",
                "reason": f"{unsorted} commits are not laid out by the "
                f"declared sort order {sort_order} — range pruning on the "
                "sort key is decaying; snapshot_optimize_incremental "
                "(no zorder_by) re-clusters ONLY those commits",
            }
        )
    if len(versions) > max_versions:
        actions.append(
            {
                "action": "expire",
                "reason": f"{len(versions)} retained versions (> "
                f"{max_versions}) — superseded files pin storage",
            }
        )
    if sketch_cols and sketch_gap and not any(
        a["action"] == "compact" for a in actions
    ):
        actions.append(
            {
                "action": "sketch_backfill",
                "reason": f"{sketch_gap}/{n_commits} commits cannot answer "
                "distinct-count queries from metadata (pre-config, partial, "
                "or tombstoned) — run snapshot_sketch_backfill (full "
                "commits, no rewrite); compaction covers the rest",
            }
        )
    if stale:
        actions.append(
            {
                "action": "drop_branches",
                "reason": f"{len(stale)} branch(es) older than "
                f"{max_branch_age_s:.0f}s pin hardlinked data past every "
                "retention window — triage then snapshot_drop_branch",
                "branches": stale,
            }
        )
    return {"version": versions[-1], "metrics": metrics, "actions": actions}


def snapshot_table_stats(root: str, version: int | None = None) -> dict:
    """``DESCRIBE DETAIL`` for a snapshot table, answered from the root
    manifest alone (O(commits) dict lookups — the observability face of
    the maintenance advisor, cheap enough for a fleet dashboard to poll
    every table every cycle).

    Returns ``{"version", "n_commits", "n_files", "total_bytes",
    "small_files", "small_bytes_threshold", "n_tombstones",
    "retained_versions", "clustered_fraction", "sketch_coverage",
    "partial_commits", "schema_cols"}``. ``clustered_fraction`` is the
    share of pinned commits covered by the latest curve-clustered
    generation (``optimized_commits``; None when the table never ran
    OPTIMIZE); ``sketch_coverage`` is the share of commits whose
    distinct sketches can answer metadata-only COUNT DISTINCT (None
    when no sketch config is active). COW-partial commits recount from
    their sidecar byte maps (O(partial commits), never O(files))."""
    import json

    from airflow_postgres_csv_spark.operators.branches import (
        snapshot_branches,
    )

    versions = snapshot_versions(root)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {root}")
    v = versions[-1] if version is None else version
    m = _load_manifest(root, v)
    small_thr = m.get("small_bytes", _SMALL_FILE_BYTES)
    opt = set(m.get("optimized_commits", []))
    sort_order = m.get("sort_order")
    sorted_cids = set(m.get("sorted_commits", []))
    sketch_cols = (m.get("sketch") or {}).get("cols", [])
    sketch_rollup = m.get("sketch_commits")
    specs = m.get("partition_specs") or []
    cparts = m.get("commit_partitions") or {}
    n_commits = n_files = total_bytes = small = 0
    clustered = sketched = partial = partitioned = sorted_n = 0
    for cid, n, subset in _commit_markers(root, m):
        n_commits += 1
        if cid in sorted_cids:
            sorted_n += 1
        nf, tb, ns = _commit_size_triple(root, m, cid, n, subset, small_thr)
        n_files += nf
        total_bytes += tb
        small += ns
        if subset is not None:
            partial += 1
        if cid in opt:
            clustered += 1
        if sketch_rollup is not None and cid in sketch_rollup:
            sketched += 1
        if cid in cparts:
            partitioned += 1
    schema_cols = len(json.loads(m["schema"])["fields"]) if m.get("schema") else 0
    return {
        "version": v,
        "n_commits": n_commits,
        "n_files": n_files,
        "total_bytes": total_bytes,
        "small_files": small,
        "small_bytes_threshold": small_thr,
        "n_tombstones": len(m.get("tombstones", [])),
        "retained_versions": len(versions),
        "clustered_fraction": (clustered / n_commits) if opt else None,
        "sketch_coverage": (sketched / n_commits) if sketch_cols else None,
        "partial_commits": partial,
        "schema_cols": schema_cols,
        # declared-partition visibility: the active spec (latest entry)
        # and the share of commits whose files carry partition values —
        # below 1.0 means staged/legacy commits rely on zone maps alone
        "partition_spec": [list(f) for f in specs[-1]] if specs else None,
        "partition_coverage": (partitioned / n_commits) if specs else None,
        # declared write order (Iceberg sort order): the clustered-by
        # columns and the share of commits actually laid out by them —
        # below 1.0 means pre-declaration or merge-scrambled commits
        # (compact restores; the advisor reports the debt)
        "sort_order": list(sort_order) if sort_order else None,
        "sorted_coverage": (
            (sorted_n / n_commits) if sort_order and n_commits else None
        ),
        "n_branches": len(snapshot_branches(root)),
        # declared CHECK constraints (name -> SQL) enforced on every
        # value-introducing write — straight from the root manifest
        "constraints": dict(m.get("constraints") or {}),
    }


def snapshot_metadata_table(
    spark, root: str, kind: str, version: int | None = None
):
    """Iceberg-style QUERYABLE metadata tables over a snapshot table —
    ``SELECT * FROM t.history`` re-expressed as driver-built DataFrames
    (the metadata is O(commits), never data-sized, so building it
    driver-side IS the scalable plan):

    - ``"history"`` — one row per retained version: (version, parent,
      mode, commit_id, n_files, n_tombstones, committed_at);
    - ``"files"`` — one row per file PINNED by ``version`` (head when
      None): (file, commit_id, bytes, record_count, partition) — bytes
      and row counts from the commit sidecar maps (record_count NULL
      for legacy sidecars), partition the hidden-partition tuple
      rendered as a string (NULL for unpartitioned commits);
    - ``"partitions"`` — files/bytes/rows aggregated per partition
      tuple: (partition, n_files, total_bytes, record_count) —
      Iceberg's partitions-table shape, all from sidecar metadata,
      zero data I/O.

    Register the result as a temp view for raw SQL
    (``snapshot_metadata_table(...).createOrReplaceTempView("t_files")``)
    — the view is a static snapshot of the metadata at registration,
    exactly like Iceberg's metadata tables pin a snapshot."""
    import json as _json

    from airflow_postgres_csv_spark.operators.snapshots import (
        _commit_of,
        _load_manifest,
        _load_sidecar,
        resolve_version,
        snapshot_history,
        snapshot_versions,
    )

    if kind == "history":
        rows = [
            (
                h["version"], h["parent"], h["mode"], h["commit_id"],
                h["n_files"], h["n_tombstones"], h["committed_at"],
            )
            for h in snapshot_history(root)
        ]
        from airflow_postgres_csv_spark.operators.localframe import (
            arrow_local_df,
        )

        return arrow_local_df(
            spark,
            rows,
            "version int, parent int, mode string, commit_id string, "
            "n_files bigint, n_tombstones bigint, committed_at bigint",
        )
    if kind not in ("files", "partitions"):
        raise ValueError(f"unknown metadata table {kind!r}")
    v = resolve_version(root, version)
    if v is None:
        v = snapshot_versions(root)[-1]
    m = _load_manifest(root, v)
    rows = []
    by_commit: dict[str, tuple[dict, dict, dict]] = {}
    for rel in m["files"]:
        cid = _commit_of(rel)
        if cid not in by_commit:
            sc = _load_sidecar(root, m, cid)
            by_commit[cid] = (
                sc.get("bytes") or {},
                sc.get("partitions") or {},
                sc.get("rows") or {},
            )
        bmap, pmap, rmap = by_commit[cid]
        ptuple = pmap.get(rel)
        nrec = rmap.get(rel)
        rows.append(
            (
                rel, cid, bmap.get(rel),
                int(nrec) if nrec is not None else None,
                _json.dumps(ptuple) if ptuple is not None else None,
            )
        )
    from airflow_postgres_csv_spark.operators.localframe import arrow_local_df

    files_df = arrow_local_df(
        spark,
        rows,
        "file string, commit_id string, bytes bigint, "
        "record_count bigint, partition string",
    )
    if kind == "files":
        return files_df
    from pyspark.sql import functions as F

    return files_df.groupBy("partition").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        # NULL when any member file predates per-file row counts — an
        # exact-or-absent contract, never an undercount
        F.when(
            F.count(F.lit(1)) == F.count("record_count"),
            F.sum("record_count"),
        ).alias("record_count"),
    )
