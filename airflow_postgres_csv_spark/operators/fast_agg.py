"""Metadata-only aggregates over versioned snapshot tables.

``SELECT COUNT(*) / MIN(c) / MAX(c)`` on an append-mostly table should not
scan data: Iceberg answers them from manifest statistics and Delta from the
transaction log. This module is that read path for our snapshot format —
exact-or-fallback, never approximate:

- **COUNT(*)**: the root manifest's per-commit ``commit_sizes`` rollup
  carries the commit row count (4th element, stamped at publish from the
  parquet footers the writer just produced) → O(commits) JSON already in
  memory, zero I/O. Commits that are partially retained (a COW rewrite kept
  only some files) or that pre-date the rollup fall back to the commit
  sidecar's per-file ``rows`` map (O(that commit) sidecar reads), then to a
  parquet FOOTER read per file (legacy sidecars; still no data scan).
- **MIN/MAX(col)**: the root's per-commit ``commit_ranges`` zone maps,
  resolved through the rename lineage (files written before an ALTER RENAME
  keep the old physical name). Partial commits consult the sidecar's
  per-file stats. A commit whose schema predates the column (rows fill with
  the declared default on read) or whose stats omit it (all-NULL row group,
  non-serializable type) makes the column non-answerable from metadata —
  the FULL column falls back to one Spark scan, so the result is exact by
  construction, never "metadata-exact-ish".
- **Merge-on-read tombstones** drop rows at read time that footer stats
  still count, so ANY live tombstone forces the scan path for everything.

All fallbacks for all requested columns plus the row count collapse into
ONE Spark aggregation job. ``allow_scan=False`` raises instead — the
serving-path guard for callers that must stay metadata-only.

No reference analog (the reference delegates aggregation to Postgres,
reference operators.py:80); this is Spark-side parity with Iceberg's
manifest-stats aggregate pushdown.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from airflow_postgres_csv_spark.operators.snapshots import (
    _commit_files_from_sidecar,
    _commit_markers,
    _footer_meta,
    _load_manifest,
    _load_sidecar,
    _written_name,
    snapshot_read,
    snapshot_versions,
)

__all__ = ["snapshot_fast_agg"]

_SOURCE_RANK = {"root": 0, "sidecar": 1, "footer": 2, "scan": 3}


def _weaker(a: str, b: str) -> str:
    return a if _SOURCE_RANK[a] >= _SOURCE_RANK[b] else b


def _schema_fields(manifest: dict, cid: str) -> set[str]:
    sj = manifest.get("commit_schemas", {}).get(cid, manifest["schema"])
    return {f["name"] for f in json.loads(sj)["fields"]}


def _metadata_rows(root: str, manifest: dict) -> tuple[int, str]:
    """Exact pinned row count from metadata: ``(n_rows, source)`` where
    source is the weakest level consulted (root < sidecar < footer)."""
    total = 0
    source = "root"
    cs = manifest.get("commit_sizes") or {}
    for cid, n, subset in _commit_markers(root, manifest):
        ent = cs.get(cid)
        if subset is None and ent is not None and len(ent) >= 4:
            total += int(ent[3])
            continue
        files = (
            subset
            if subset is not None
            else _commit_files_from_sidecar(root, manifest, cid, n)
        )
        rmap = _load_sidecar(root, manifest, cid).get("rows") or {}
        for rel in files:
            if rel in rmap:
                total += int(rmap[rel])
                source = _weaker(source, "sidecar")
            else:
                total += _footer_meta(os.path.join(root, rel))[1]
                source = _weaker(source, "footer")
    return total, source


def _metadata_range(
    root: str, manifest: dict, col: str
) -> tuple[list | None, str]:
    """Exact [min, max] for ``col`` from zone maps, or ``(None, "scan")``
    when any pinned commit cannot vouch for it (column added later and
    default-filled on read, stats absent, empty ranges)."""
    history = manifest.get("column_history") or {}
    ranges = manifest.get("commit_ranges") or {}
    lo = hi = None
    source = "root"
    saw_rows = False
    for cid, n, subset in _commit_markers(root, manifest):
        if n == 0:
            continue
        phys = _written_name(col, _schema_fields(manifest, cid), history)
        if phys is None:
            # the commit's files predate the column: its rows surface the
            # declared default on read, which no footer stat covers
            return None, "scan"
        if subset is None:
            rng = (ranges.get(cid) or {}).get(phys)
            if rng is None:
                return None, "scan"
            pairs = [rng]
        else:
            stats = _load_sidecar(root, manifest, cid).get("stats") or {}
            pairs = []
            for rel in subset:
                rng = (stats.get(rel) or {}).get(phys)
                if rng is None:
                    return None, "scan"
                pairs.append(rng)
            source = _weaker(source, "sidecar")
        for mn, mx in pairs:
            saw_rows = True
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
    if not saw_rows:
        return None, "scan"  # empty table: scan path yields NULLs exactly
    return [lo, hi], source


def snapshot_fast_agg(
    root: str,
    cols: tuple[str, ...] | list[str] = (),
    *,
    version: int | None = None,
    spark: SparkSession | None = None,
    allow_scan: bool = True,
) -> dict:
    """COUNT(*) plus per-column MIN/MAX for a snapshot table version,
    answered from metadata where exactness is provable and from ONE Spark
    scan otherwise. Returns::

        {"version": v, "n_rows": int, "rows_source": src,
         "columns": {col: {"min": .., "max": .., "source": src}}}

    where ``src`` is ``root`` (manifest rollup, zero I/O beyond the root),
    ``sidecar`` (O(partial commits) sidecar JSON reads), ``footer``
    (legacy per-file parquet footer reads — metadata, never data pages),
    or ``scan`` (the exactness fallback). ``allow_scan=False`` raises
    RuntimeError instead of scanning; ``spark`` is only required when the
    scan fallback is reachable."""
    versions = snapshot_versions(root)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions under {root}")
    v = versions[-1] if version is None else version
    manifest = _load_manifest(root, v)
    current = {f["name"] for f in json.loads(manifest["schema"])["fields"]}
    missing = [c for c in cols if c not in current]
    if missing:
        raise ValueError(f"columns not in version {v} schema: {missing}")

    out: dict = {"version": v, "columns": {}}
    scan_cols: list[str] = []
    need_scan_rows = False

    if manifest.get("tombstones"):
        # MOR deletes remove rows the footers still count — only the read
        # path (which applies tombstones) is exact
        need_scan_rows = True
        scan_cols = list(cols)
    else:
        n_rows, src = _metadata_rows(root, manifest)
        out["n_rows"], out["rows_source"] = n_rows, src
        for c in cols:
            rng, csrc = _metadata_range(root, manifest, c)
            if rng is None:
                scan_cols.append(c)
            else:
                out["columns"][c] = {"min": rng[0], "max": rng[1], "source": csrc}

    if need_scan_rows or scan_cols:
        if not allow_scan:
            what = (["COUNT(*)"] if need_scan_rows else []) + scan_cols
            raise RuntimeError(
                f"metadata cannot answer {what} exactly for version {v} "
                "(live tombstones or uncovered column stats) and "
                "allow_scan=False"
            )
        if spark is None:
            raise ValueError("scan fallback required but spark=None")
        from pyspark.sql import functions as F

        df = snapshot_read(spark, root, version=v)
        aggs = []
        if need_scan_rows:
            aggs.append(F.count(F.lit(1)).alias("__n"))
        for c in scan_cols:
            aggs.append(F.min(c).alias(f"__mn_{c}"))
            aggs.append(F.max(c).alias(f"__mx_{c}"))
        row = df.agg(*aggs).collect()[0].asDict()
        if need_scan_rows:
            out["n_rows"], out["rows_source"] = int(row["__n"]), "scan"
        for c in scan_cols:
            out["columns"][c] = {
                "min": row[f"__mn_{c}"], "max": row[f"__mx_{c}"],
                "source": "scan",
            }
    return out
