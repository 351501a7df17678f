"""Metadata-only maintenance advisor for snapshot tables.

A 100 TB lakehouse table degrades along four independent axes — small
files accumulate (append cadence), merge-on-read tombstones stack up
(read-side anti-join cost), fresh commits arrive unclustered (scan
pruning decays), and superseded versions pin storage (expire debt).
Each has a maintenance op (``snapshot_compact``,
``snapshot_optimize_incremental``, ``snapshot_expire``); what an
operator loop needs is the DECISION — cheap enough to run every cycle
on thousands of tables.

``snapshot_maintenance_plan`` answers it from the ROOT MANIFEST alone
(plus per-file byte sizes via ``os.path.getsize`` — a stat call per
pinned file, no data read, no Spark job): a dict of per-action
recommendations with the metrics that triggered them. Thresholds are
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
    _commit_markers,
    _load_manifest,
    _load_sidecar,
    snapshot_versions,
)

__all__ = ["snapshot_maintenance_plan"]


def snapshot_maintenance_plan(
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
    max_tombstones: int = 4,
    max_unoptimized_commits: int = 8,
    max_versions: int = 32,
) -> dict:
    """Inspect the latest manifest and recommend maintenance actions.

    Returns ``{"version", "metrics": {...}, "actions": [
    {"action", "reason"}, ...]}`` where ``action`` is one of
    ``compact`` (small-file debt or tombstone debt — a full clustered
    rewrite folds both), ``optimize_incremental`` (the table has a
    curve-clustered generation and enough unclustered newer commits to
    warrant a cycle), ``expire`` (retained version count beyond
    ``max_versions``), and ``sketch_backfill`` (a sketch config is
    active but some commits predate it or were tombstone-invalidated —
    ``snapshot_compact`` re-sketches everything it rewrites). An empty
    ``actions`` list means the table is healthy; the metrics are always
    returned so a fleet scheduler can apply its own policy."""
    versions = snapshot_versions(root)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {root}")
    m = _load_manifest(root, versions[-1])
    sizes = [
        os.path.getsize(os.path.join(root, rel)) for rel in m["files"]
    ]
    small = sum(1 for s in sizes if s < target_bytes // 4)
    tombs = m.get("tombstones", [])
    opt = set(m.get("optimized_commits", []))
    n_commits = unoptimized = 0
    sketch_gap = 0
    sketch_cols = (m.get("sketch") or {}).get("cols", [])
    tomb_cids: set = set()
    for t in tombs:
        if t.get("kind") == "positional":
            tomb_cids |= {r.split(os.sep)[1] for r in t["applies"]}
        else:
            tomb_cids |= set(t["commits"])
    for cid, n, subset in _commit_markers(root, m):
        n_commits += 1
        if opt and cid not in opt:
            unoptimized += 1
        if sketch_cols:
            has = bool((_load_sidecar(root, m, cid).get("sketches") or {}))
            if not has or subset is not None or cid in tomb_cids:
                sketch_gap += 1
    metrics = {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "small_files": small,
        "n_tombstones": len(tombs),
        "n_commits": n_commits,
        "unoptimized_commits": unoptimized if opt else None,
        "sketch_gap_commits": sketch_gap if sketch_cols else None,
        "retained_versions": len(versions),
    }
    actions = []
    if len(sizes) > 1 and small > len(sizes) / 2:
        actions.append(
            {
                "action": "compact",
                "reason": f"{small}/{len(sizes)} files under "
                f"{target_bytes // 4} bytes — small-file debt",
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
    return {"version": versions[-1], "metrics": metrics, "actions": actions}
