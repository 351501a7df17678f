"""Branches and write-audit-publish (WAP) for versioned snapshot tables.

Iceberg's branch/WAP pattern, re-expressed on the hardlink-clone
primitive (operators/snapshots.py:snapshot_clone): a branch is a clone
that lives INSIDE the table root (``<root>/_branches/<name>``), created
in O(files) metadata operations with zero bytes moved. Every existing
snapshot operator (commit, MERGE INTO, delete, compaction, expectations)
works on the branch root unchanged — the branch is just a root. What the
branch adds over a free-standing clone is the PUBLISH edge back:

- ``snapshot_publish_branch`` fast-forwards main to the branch head in
  one atomic manifest link, after hardlinking the branch's new data /
  delete / sidecar files back into the table root. Publication is
  fast-forward-only: if main advanced past the branch's base version the
  publish refuses (``SnapshotConflictError``) — re-branch and replay
  rather than silently dropping main's commits. The atomic link carries
  first-writer-wins semantics, so two racing publishes cannot both land.
- ``write_audit_publish`` is the one-call WAP gate: stage a commit on an
  ephemeral audit branch, run AGGREGATE audits against the branch head
  (the full would-be table state, not just the increment — the
  complement of the per-row gates in operators/expectations.py), publish
  on pass, and on fail leave main untouched with the quarantined branch
  retained for triage.

At 100 TB the costs are all metadata-sized: branch creation links
O(files) names (no data movement), audits run Spark jobs against the
branch like any read, and publish links only the files the branch ADDED
(O(changed commits) via the manifest's commit markers, never a rewrite).

No reference analog (the reference is an Airflow ETL shim,
/root/reference/src/airflow_postgres_csv/operators.py:12-98) — extension
surface; semantics follow Iceberg's WAP / branch docs and Delta's
shallow-clone-then-swap pattern from public sources.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from airflow_postgres_csv_spark.operators.snapshots import (
    SnapshotConflictError,
    _load_manifest,
    _publish,
    snapshot_clone,
    snapshot_commit,
    snapshot_files_diff,
    snapshot_read,
    snapshot_versions,
)

__all__ = [
    "snapshot_branch",
    "snapshot_branches",
    "snapshot_drop_branch",
    "snapshot_publish_branch",
    "write_audit_publish",
    "AuditError",
]

_BRANCH_DIR = "_branches"


class AuditError(RuntimeError):
    """A WAP audit failed; main is untouched, the branch is retained."""

    def __init__(self, branch: str, failed: list[str]):
        super().__init__(
            f"audit failed on branch {branch!r}: {', '.join(failed)} "
            "(main unchanged; branch retained for triage)"
        )
        self.branch = branch
        self.failed = failed


def _branch_root(root: str, name: str) -> str:
    if not name or "/" in name or os.sep in name or name.startswith("."):
        raise ValueError(f"invalid branch name {name!r}")
    return os.path.join(root, _BRANCH_DIR, name)


def snapshot_branch(root: str, name: str, version: int | str | None = None) -> str:
    """Create branch ``name`` from a pinned main version (default head)
    and return its root path — directly usable with every snapshot
    operator. The branch is a hardlink clone under ``<root>/_branches``;
    its v1 manifest records the fork point (``cloned_from``)."""
    broot = _branch_root(root, name)
    if snapshot_versions(broot):
        raise FileExistsError(f"branch {name!r} already exists at {broot}")
    snapshot_clone(root, broot, version=version)
    return broot


def snapshot_branches(root: str) -> dict[str, dict]:
    """Live branches: name -> {base (main version forked from),
    head (branch-local head version), root}."""
    bdir = os.path.join(root, _BRANCH_DIR)
    out: dict[str, dict] = {}
    if not os.path.isdir(bdir):
        return out
    for name in sorted(os.listdir(bdir)):
        broot = os.path.join(bdir, name)
        versions = snapshot_versions(broot)
        if not versions:
            continue
        base = _load_manifest(broot, versions[0]).get("cloned_from")
        out[name] = {"base": base, "head": versions[-1], "root": broot}
    return out


def snapshot_drop_branch(root: str, name: str) -> None:
    """Remove a branch (its directory and branch-local manifests).
    Hardlinked data shared with main survives — only the branch's names
    are unlinked, exactly like ``snapshot_expire`` on a clone."""
    shutil.rmtree(_branch_root(root, name))


def snapshot_publish_branch(
    root: str, name: str, drop: bool = True
) -> dict:
    """Fast-forward main to the branch head, atomically.

    Files the branch added since its base (new commits' data files,
    delete-tombstone key files, commit sidecars) are hardlinked back
    into the table root first, then ONE manifest is published on main
    carrying the branch head's exact state — schema, tombstones,
    per-commit metadata, partition specs, rollups. The manifest link is
    the atomic commit point (first-writer-wins). Fast-forward-only: if
    main moved past the branch's base the publish raises
    ``SnapshotConflictError`` before touching anything."""
    broot = _branch_root(root, name)
    bversions = snapshot_versions(broot)
    if not bversions:
        raise FileNotFoundError(f"no branch {name!r} at {broot}")
    base = _load_manifest(broot, bversions[0]).get("cloned_from")
    versions = snapshot_versions(root)
    if not versions or versions[-1] != base:
        raise SnapshotConflictError(
            f"branch {name!r} forked from version {base} but main is at "
            f"{versions[-1] if versions else None}; fast-forward publish "
            "refused — re-branch from the current head and replay"
        )
    bm = _load_manifest(broot, bversions[-1])
    base_m = _load_manifest(root, base)
    added, _removed = snapshot_files_diff(broot, base_m, bm)
    to_link = list(added)
    for t in bm.get("tombstones", []):
        to_link.extend(t["files"])
    if bm.get("merge_info"):
        to_link.extend(bm["merge_info"]["key_files"])
    to_link.extend(bm.get("sidecars", {}).values())
    for rel in to_link:
        dst = os.path.join(root, rel)
        if os.path.exists(dst):
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(os.path.join(broot, rel), dst)
    body = {
        k: bm[k]
        for k in (
            "files", "n_files", "schema", "commit_schemas", "commit_ranges",
            "tombstones", "sidecars", "bloom", "defaults", "merge_info",
            "commit_sizes", "sketch_commits", "small_bytes",
            "partition_specs", "commit_partitions", "partition_spec",
            "last_batch_id", "cdc_applied_version", "ivm_applied_version",
            "sketch",
        )
        if k in bm
    }
    commit_id = uuid.uuid4().hex[:12]
    body.update(
        mode="publish_branch",
        commit_id=commit_id,
        branch=name,
        branch_base=base,
        branch_commits=len(bversions) - 1,
    )
    out = _publish(
        root, versions, body, commit_id, None,
        pack_hints=dict.get(bm, "commit_files"),
    )
    if drop:
        snapshot_drop_branch(root, name)
    return out


def write_audit_publish(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    audits: dict,
    branch: str | None = None,
    **commit_kwargs,
) -> dict:
    """One-call WAP: commit ``df`` on an ephemeral branch, audit the
    branch head (the FULL would-be table state), publish on pass.

    ``audits`` maps audit name -> either a SQL boolean expression
    evaluated over the staged table (aggregates allowed, e.g.
    ``"count(*) > 0 AND sum(amount) >= 0"``) or a callable
    ``(DataFrame) -> bool``. All audits run; if any fails, main is left
    untouched, the branch is RETAINED for triage, and ``AuditError``
    lists the failures. On success returns the published main manifest
    (the branch is consumed)."""
    name = branch or f"wap-{uuid.uuid4().hex[:8]}"
    broot = snapshot_branch(root, name)
    snapshot_commit(df, broot, **commit_kwargs)
    staged = snapshot_read(spark, broot)
    failed = []
    for aname, audit in audits.items():
        if callable(audit):
            ok = bool(audit(staged))
        else:
            ok = bool(staged.selectExpr(f"({audit}) AS ok").first()[0])
        if not ok:
            failed.append(aname)
    if failed:
        raise AuditError(name, failed)
    return snapshot_publish_branch(root, name)
