"""Runtime join-time file pruning for snapshot tables (dynamic file
pruning — Spark's DPP / Delta's dynamic file pruning, re-expressed
against the snapshot manifest's metadata hierarchy).

The classic 100-TB star-join shape: a huge fact table joined to a small,
heavily-filtered dimension. Spark's own dynamic partition pruning only
fires for Hive-style static partitions; for snapshot tables the manifest
already knows, per commit and per file, the [min, max] zone of every
tracked column plus optional Bloom bitsets — so the dimension's join-key
set can prune FACT FILES before the scan is even planned:

1. the build (dimension) side is reduced to a bounded runtime filter —
   the exact distinct key set when it fits in ``max_keys``, else the
   [min, max] envelope (one scalar row) — with driver memory bounded by
   construction, never O(dimension);
2. whole commits are pruned from the root manifest alone (commit-level
   ranges + declared-partition summaries): a pruned commit's sidecar is
   never opened, its file names never enumerated;
3. surviving commits' per-file zone maps drop files whose [min, max]
   contains NO key (binary search over the sorted key set);
4. per-file Bloom bitsets (when configured on the join column) drop
   files whose range overlaps but which provably hold none of the keys —
   the hash-distributed-key case where zone maps keep everything.

Pruning is safe-by-construction for inner and semi joins only (a pruned
fact row could not have matched: every skip is justified by a recorded
range/bitset that excludes all build keys, and false positives merely
scan extra files — the join's equality condition is still applied on the
survivors). Outer joins need the non-matching fact rows and are
rejected loudly.

Reference parity: the reference (operators.py:80) delegates joins to
Postgres, whose planner does Bloom/hash runtime filtering inside one
node; at cluster scale the equivalent win is not scanning the files at
all.
"""

from __future__ import annotations

from bisect import bisect_left

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators import partitioning as P
from airflow_postgres_csv_spark.operators.snapshots import (
    _bloom_might_contain,
    _bloom_probe_key,
    _commit_files_from_sidecar,
    _commit_markers,
    _load_manifest,
    _load_sidecar,
    _range_disjoint,
    _read_pinned,
    resolve_version,
    snapshot_versions,
)

__all__ = [
    "runtime_filter",
    "snapshot_join_files",
    "snapshot_join",
]

_BLOOM_PROBE_CAP = 64  # max keys probed against one file's bitset


def runtime_filter(build: DataFrame, col: str, max_keys: int = 10_000) -> dict:
    """Reduce the build side to a bounded pruning filter.

    One job collects ``distinct(col) LIMIT max_keys+1`` (driver memory
    O(max_keys), never O(build)). If the key set fits: ``mode="keys"``
    with the sorted non-null keys. If it overflows: a second scalar
    aggregate produces the ``mode="range"`` [min, max] envelope — still
    one row on the driver, still prunes commits/files whose zone is
    disjoint from the build's extent. An empty build side yields
    ``mode="empty"`` (every fact file prunes)."""
    rows = build.select(col).where(F.col(col).isNotNull()).distinct().limit(
        max_keys + 1
    ).collect()
    if len(rows) <= max_keys:
        keys = sorted(r[0] for r in rows)
        if not keys:
            return {"mode": "empty"}
        return {"mode": "keys", "keys": keys, "lo": keys[0], "hi": keys[-1]}
    lo, hi = build.agg(F.min(col), F.max(col)).first()
    return {"mode": "range", "lo": lo, "hi": hi}


def _keys_in_range(keys: list, rng) -> list:
    """The sorted build keys that fall inside a recorded [min, max] zone
    (binary search; incomparable stats keep everything — the safe
    default, mirroring ``_range_disjoint``)."""
    if rng is None:
        return keys
    try:
        i = bisect_left(keys, rng[0])
    except TypeError:
        return keys
    out = []
    for k in keys[i:]:
        try:
            if k > rng[1]:
                break
        except TypeError:
            return keys
        out.append(k)
    return out


def snapshot_join_files(
    root: str, col: str, filt: dict, version: int | str | None = None
) -> dict:
    """Planning-only: the per-file keep/skip decision for a runtime
    filter produced by ``runtime_filter``. Returns the kept file list
    plus the counters the tests pin (files kept/skipped, whole commits
    pruned from the root, sidecars opened, files dropped by Bloom)."""
    versions = snapshot_versions(root)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {root}")
    v = resolve_version(root, version)
    if v is None:
        v = versions[-1]
    manifest = _load_manifest(root, v)
    mode = filt["mode"]
    counters = {
        "kept": 0, "skipped": 0, "commits_skipped": 0,
        "sidecars_loaded": 0, "bloom_skipped": 0, "mode": mode,
    }
    if mode == "empty":
        for _cid, n, _subset in _commit_markers(root, manifest):
            counters["skipped"] += n
            counters["commits_skipped"] += 1
        return {"kept_files": [], **counters}
    lo, hi = filt["lo"], filt["hi"]
    keys = filt.get("keys")
    cfg = manifest.get("bloom") or {}
    use_bloom = keys is not None and col in cfg.get("cols", [])
    if use_bloom:
        _bloom_probe_key(keys[0])  # loud error for unsupported key types
    commit_ranges = manifest.get("commit_ranges", {})
    specs = manifest.get("partition_specs") or []
    cparts = manifest.get("commit_partitions", {}) if specs else {}
    pred_cache: dict[int, list] = {}
    kept: list[str] = []
    for cid, n, subset in _commit_markers(root, manifest):
        # commit level: zone envelope from the root alone
        if _range_disjoint((commit_ranges.get(cid) or {}).get(col), lo, hi):
            counters["commits_skipped"] += 1
            counters["skipped"] += n
            continue
        # commit level: declared-partition summary vs the envelope
        cp = cparts.get(cid)
        if cp is not None:
            si = cp.get("s", len(specs) - 1)
            if 0 <= si < len(specs):
                if si not in pred_cache:
                    pred_cache[si] = P.map_predicates(specs[si], {col: (lo, hi)})
                ppreds = pred_cache[si]
                if any(p is not None for p in ppreds) and P.prune_commit(
                    cp.get("f") or [], ppreds
                ):
                    counters["commits_skipped"] += 1
                    counters["skipped"] += n
                    continue
        sc = _load_sidecar(root, manifest, cid)
        counters["sidecars_loaded"] += 1
        stats = sc.get("stats", {})
        blooms = sc.get("blooms", {})
        if subset is not None:
            rels = subset
        else:
            rels = sc.get("files") or list(stats)
            if len(rels) != n:
                rels = _commit_files_from_sidecar(root, manifest, cid, n)
        for rel in rels:
            rng = stats.get(rel, {}).get(col)
            if keys is None:
                if _range_disjoint(rng, lo, hi):
                    counters["skipped"] += 1
                    continue
                kept.append(rel)
                continue
            cand = _keys_in_range(keys, rng)
            if not cand:
                counters["skipped"] += 1
                continue
            if use_bloom and len(cand) <= _BLOOM_PROBE_CAP:
                words = blooms.get(rel, {}).get(col)
                if words is not None and not any(
                    _bloom_might_contain(words, k, cfg["m"], cfg["k"])
                    for k in cand
                ):
                    counters["skipped"] += 1
                    counters["bloom_skipped"] += 1
                    continue
            kept.append(rel)
    counters["kept"] = len(kept)
    return {"kept_files": kept, **counters}


def snapshot_join(
    spark: SparkSession,
    root: str,
    build: DataFrame,
    on,
    how: str = "inner",
    version: int | str | None = None,
    max_keys: int = 10_000,
) -> DataFrame:
    """Join a snapshot fact table (probe side, LEFT) to a small/filtered
    build DataFrame with manifest-level file skipping driven by the
    build side's actual key set — scan only the fact files that might
    hold a matching key.

    ``on`` is the join column name (same on both sides) or a
    ``(fact_col, build_col)`` pair. Only ``inner`` and ``left_semi``
    are accepted: for any outer flavor the pruned fact rows would be
    missing from the result, so the planner refuses rather than
    silently changing semantics. In ``keys`` mode the build side is
    broadcast (its distinct key count is proven ≤ ``max_keys``); in the
    overflow ``range`` mode the join strategy is left to Catalyst/AQE.
    The join's equality condition still applies on the survivors, so
    Bloom/zone false positives cost extra scan, never wrong rows.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"runtime file pruning is only sound for inner/left_semi joins "
            f"(a pruned fact row must be provably non-matching); got {how!r}"
        )
    fcol, bcol = (on, on) if isinstance(on, str) else on
    filt = runtime_filter(build, bcol, max_keys=max_keys)
    plan = snapshot_join_files(root, fcol, filt, version=version)
    versions = snapshot_versions(root)
    v = resolve_version(root, version)
    if v is None:
        v = versions[-1]
    manifest = _load_manifest(root, v)
    fact = _read_pinned(spark, root, manifest, plan["kept_files"])
    right = F.broadcast(build) if filt["mode"] in ("keys", "empty") else build
    if fcol == bcol:
        return fact.join(right, on=fcol, how=how)
    return fact.join(right, on=fact[fcol] == right[bcol], how=how)
