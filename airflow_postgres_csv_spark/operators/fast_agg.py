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
    _STATS_V_KEY,
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


def _probe_image(value, dtype: str | None):
    """The hive-path PARSE image of a ``where`` equality literal for an
    identity-partitioned column of Spark type ``dtype`` — the recorded
    partition tuples are parsed back from path segments
    (``partitioning.partition_values_from_rel``), which int-coerces
    numeric-looking segments, so the probe must round-trip the same
    encoding or equality against the tuples silently excludes matching
    files. Returns None when membership is UNPROVABLE from parsed
    tuples: a string literal that int-parses (the parse conflates
    '0123' with '123'), or any non-int/non-string type (bool/float/
    temporal renderings are writer-specific) — the caller then falls
    back to the one-scan path, exact by construction."""
    if (
        dtype in ("byte", "short", "integer", "long")
        and isinstance(value, int)
        and not isinstance(value, bool)
    ):
        return value
    if dtype == "string" and isinstance(value, str):
        try:
            int(value)
            return None  # path parse int-coerces: distinct strings conflate
        except ValueError:
            return value
    return None


def _where_image(manifest: dict, where: dict):
    """Per-column probe preparation for an equality ``where`` over
    identity-partitioned columns: ``(raw_ok, img)`` where ``raw_ok[c]``
    says the raw literal may be compared against FAITHFUL (tuples_v=2)
    tuples, and ``img[c]`` is the lossy-parse image for legacy tuples
    (None when unprovable under that encoding). Returns None when a
    column is unprovable under EVERY vintage — the caller scans."""
    cur_types = {
        f["name"]: f["type"] for f in json.loads(manifest["schema"])["fields"]
    }
    raw_ok: dict[str, bool] = {}
    img: dict[str, object] = {}
    for c, v in where.items():
        dt = cur_types.get(c)
        raw_ok[c] = (dt == "string" and isinstance(v, str)) or (
            dt in ("byte", "short", "integer", "long")
            and isinstance(v, int)
            and not isinstance(v, bool)
        )
        img[c] = _probe_image(v, dt)
        if not raw_ok[c] and img[c] is None:
            return None
    return raw_ok, img


def _sidecar_probe(
    sc: dict, where: dict, raw_ok: dict, img: dict
) -> dict | None:
    """The per-sidecar equality probe: raw values against faithful
    (tuples_v=2) tuples, the lossy-parse image against legacy tuples;
    None when THIS sidecar's vintage cannot prove equality."""
    if sc.get("tuples_v") == 2:
        if not all(raw_ok[c] for c in where):
            return None  # type-mismatched probe: equality undefined
        return dict(where)
    if any(img[c] is None for c in where):
        return None  # lossy-parse vintage, ambiguous encoding
    return img


def _identity_index(spec: list, col: str) -> int | None:
    """Position of ``col`` as an IDENTITY transform in the spec, else
    None (derived transforms cannot prove row-level equality)."""
    return next(
        (k for k, f in enumerate(spec) if f[0] == col and f[1] == "identity"),
        None,
    )


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
    default-filled on read, stats absent, empty ranges, stats written by
    a pre-stamp engine whose coverage/exactness is unverifiable, or
    cross-commit ranges whose types no longer compare after evolution)."""
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
            rng_map = ranges.get(cid) or {}
            if not rng_map.get(_STATS_V_KEY):
                # unstamped ranges may be merged from a SUBSET of row
                # groups/files (pre-coverage-fix writers) — under-covering
                # bounds would be served as exact; only pruning may use them
                return None, "scan"
            rng = rng_map.get(phys)
            if rng is None:
                return None, "scan"
            pairs = [rng]
        else:
            sc = _load_sidecar(root, manifest, cid)
            if not sc.get("stats_v"):
                return None, "scan"  # same vintage gate, per-file stats
            stats = sc.get("stats") or {}
            pairs = []
            for rel in subset:
                rng = (stats.get(rel) or {}).get(phys)
                if rng is None:
                    return None, "scan"
                pairs.append(rng)
            source = _weaker(source, "sidecar")
        try:
            for mn, mx in pairs:
                saw_rows = True
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
        except TypeError:
            # renamed/evolved columns can carry differently-typed ranges
            # across commits — incomparable means unanswerable, not a crash
            return None, "scan"
    if not saw_rows:
        return None, "scan"  # empty table: scan path yields NULLs exactly
    return [lo, hi], source


def _partition_filtered(
    root: str, manifest: dict, where: dict, cols: list[str],
    sums_cols: list[str] = (),
) -> tuple | None:
    """Exact COUNT(*)/MIN/MAX/SUM under an identity-partition equality
    predicate, from metadata: with a declared spec whose ``where``
    columns are IDENTITY transforms, a file's partition tuple decides
    membership for EVERY row (one value per file, both directions), so
    matching files contribute their full sidecar row counts, their
    footer ranges are the ranges of matching rows, and their sidecar
    sums add up exactly. Returns ``(n_rows, {col: [min, max] | None},
    dead_cols, source, {col: [sum, n_nonnull]}, dead_sum_cols)`` —
    ``dead`` sets name the columns that must fall back to the filtered
    scan — or None when metadata cannot decide membership at all (no
    spec, a commit without tuples, a non-identity field, a missing
    per-file tuple). O(matching commits) sidecar reads; commits whose
    root summary excludes the value are never opened."""
    from airflow_postgres_csv_spark.operators import partitioning as P

    specs = manifest.get("partition_specs") or []
    cparts = manifest.get("commit_partitions") or {}
    if not specs:
        return None
    history = manifest.get("column_history") or {}
    # Commits stamped ``tuples_v: 2`` recorded FAITHFUL tuples (string
    # fields keep raw path text): raw-value equality is exact there.
    # Legacy commits' tuples came from the lossy int-coercing parse —
    # probe those through the same encoding (_probe_image) and refuse
    # when it cannot prove equality.
    probes = _where_image(manifest, where)
    if probes is None:
        return None  # unprovable under any vintage: one filtered scan
    raw_ok, img = probes
    want = {c: (v, v) for c, v in where.items()}
    total = 0
    ranges: dict[str, list | None] = {c: None for c in cols}
    fsums: dict[str, list] = {c: [0, 0] for c in sums_cols}
    dead: set[str] = set()  # cols that must scan
    dead_sums: set[str] = set()
    source = "root"
    pred_cache: dict[int, list] = {}
    for cid, n, subset in _commit_markers(root, manifest):
        if n == 0:
            continue
        cp = cparts.get(cid)
        if cp is None:
            return None  # pre-spec commit: membership unprovable
        si = cp.get("s", len(specs) - 1)
        if not (0 <= si < len(specs)):
            return None
        spec = specs[si]
        idx: dict[str, int] = {}
        for c in where:
            j = _identity_index(spec, c)
            if j is None:
                return None  # not identity-partitioned in this commit
            idx[c] = j
        if si not in pred_cache:
            pred_cache[si] = P.map_predicates(spec, want)
        if P.prune_commit(cp.get("f") or [], pred_cache[si]):
            continue  # whole commit excluded from the root summary alone
        sc = _load_sidecar(root, manifest, cid)
        source = _weaker(source, "sidecar")
        probe = _sidecar_probe(sc, where, raw_ok, img)
        if probe is None:
            return None
        pvals = sc.get("partitions") or {}
        rmap = sc.get("rows") or {}
        stats = sc.get("stats") or {}
        files = (
            subset
            if subset is not None
            else (sc.get("files") or list(stats))
        )
        if subset is None and len(files) != n:
            files = _commit_files_from_sidecar(root, manifest, cid, n)
        fields = _schema_fields(manifest, cid)
        phys_of = {
            c: _written_name(c, fields, history)
            for c in set(cols) | set(sums_cols)
        }
        smap = sc.get("sums") or {}
        for rel in files:
            tup = pvals.get(rel)
            if tup is None:
                return None  # file without a recorded tuple
            if any(tup[idx[c]] != probe[c] for c in where):
                continue  # identity mismatch: provably zero matching rows
            if rel in rmap:
                total += int(rmap[rel])
            else:
                total += _footer_meta(os.path.join(root, rel))[1]
                source = _weaker(source, "footer")
            for c in cols:
                if c in dead:
                    continue
                phys = phys_of[c]
                rng = (
                    (stats.get(rel) or {}).get(phys)
                    if phys and sc.get("stats_v")  # vintage gate: only the
                    else None  # coverage-fixed writer's stats are exact
                )
                if rng is None:
                    dead.add(c)
                    ranges[c] = None
                    continue
                cur = ranges[c]
                try:
                    ranges[c] = (
                        list(rng)
                        if cur is None
                        else [min(cur[0], rng[0]), max(cur[1], rng[1])]
                    )
                except TypeError:
                    dead.add(c)  # incomparable cross-commit types: scan
                    ranges[c] = None
            for c in sums_cols:
                if c in dead_sums:
                    continue
                phys = phys_of[c]
                ent = (smap.get(rel) or {}).get(phys) if phys else None
                if ent is None:
                    dead_sums.add(c)
                    continue
                fsums[c][0] += int(ent[0])
                fsums[c][1] += int(ent[1])
    for c in dead:
        ranges[c] = None
    return total, ranges, dead, source, fsums, dead_sums


def _group_rollup(
    root: str,
    manifest: dict,
    group_by: list[str],
    sums_cols: list[str],
    range_cols: list[str] = (),
    where: dict | None = None,
) -> tuple | None:
    """Exact per-group ``{key: [n_rows, {col: [sum, nn]},
    {col: [min, max]}]}`` for IDENTITY-partitioned column(s), from
    commit sidecars alone — Iceberg's partitions-metadata-table rollup
    as a GROUP BY: every file holds exactly one value of each
    identity-transform column, so its sidecar row count, per-file sums,
    and per-file zone maps attribute to that group (a TUPLE key for
    multi-column grouping) exactly. An optional equality ``where`` over
    further identity columns restricts the rollup file-by-file — whole
    commits the root partition summary excludes are pruned before their
    sidecar is opened. Returns ``(groups, source)`` or None when any
    pinned file cannot prove its group or membership (no spec, pre-spec
    commit, non-identity field, missing tuple, a string column whose
    parsed tuple int-coerced — '0123' and '123' conflate in hive paths,
    unless the sidecar carries faithful tuples_v=2 tuples — a file
    without recorded sums, or unstamped/absent/incomparable range stats
    for ``range_cols``). O(commits) sidecar reads, zero data I/O."""
    from airflow_postgres_csv_spark.operators import partitioning as P

    specs = manifest.get("partition_specs") or []
    cparts = manifest.get("commit_partitions") or {}
    if not specs:
        return None
    history = manifest.get("column_history") or {}
    cur_types = {
        f["name"]: f["type"] for f in json.loads(manifest["schema"])["fields"]
    }
    dtypes = [cur_types.get(g) for g in group_by]
    if any(
        dt not in ("byte", "short", "integer", "long", "string")
        for dt in dtypes
    ):
        return None
    if where:
        probes = _where_image(manifest, where)
        if probes is None:
            return None
        raw_ok, img = probes
        want = {c: (val, val) for c, val in where.items()}
        pred_cache: dict[int, list] = {}
    multi = len(group_by) > 1
    groups: dict = {}
    source = "sidecar"
    for cid, n, subset in _commit_markers(root, manifest):
        if n == 0:
            continue
        cp = cparts.get(cid)
        if cp is None:
            return None  # pre-spec commit: group attribution unprovable
        si = cp.get("s", len(specs) - 1)
        if not (0 <= si < len(specs)):
            return None
        spec = specs[si]
        idxs = [_identity_index(spec, g) for g in group_by]
        if any(j is None for j in idxs):
            return None  # not identity-partitioned in this commit
        probe: dict | None = None
        widx: dict[str, int] = {}
        if where:
            for c in where:
                wj = _identity_index(spec, c)
                if wj is None:
                    return None
                widx[c] = wj
            if si not in pred_cache:
                pred_cache[si] = P.map_predicates(spec, want)
            if P.prune_commit(cp.get("f") or [], pred_cache[si]):
                continue  # whole commit excluded from the root summary
        sc = _load_sidecar(root, manifest, cid)
        if where:
            probe = _sidecar_probe(sc, where, raw_ok, img)
            if probe is None:
                return None
        pvals = sc.get("partitions") or {}
        rmap = sc.get("rows") or {}
        smap = sc.get("sums") or {}
        stats = sc.get("stats") or {}
        if range_cols and not sc.get("stats_v"):
            return None  # unstamped vintage: ranges not provably exact
        files = (
            subset
            if subset is not None
            else (sc.get("files") or list(sc.get("stats") or {}))
        )
        if subset is None and len(files) != n:
            files = _commit_files_from_sidecar(root, manifest, cid, n)
        fields = _schema_fields(manifest, cid)
        phys_of = {
            c: _written_name(c, fields, history)
            for c in set(sums_cols) | set(range_cols)
        }
        faithful = sc.get("tuples_v") == 2
        for rel in files:
            tup = pvals.get(rel)
            if tup is None:
                return None
            if probe is not None and any(
                tup[widx[c]] != probe[c] for c in where
            ):
                continue  # identity mismatch: provably zero matching rows
            vals = [tup[j] for j in idxs]
            if not faithful and any(
                dt == "string" and isinstance(gv, int)
                for dt, gv in zip(dtypes, vals)
            ):
                return None  # int-coerced path parse: value irrecoverable
            gval = tuple(vals) if multi else vals[0]
            if rel in rmap:
                nrows = int(rmap[rel])
            else:
                nrows = _footer_meta(os.path.join(root, rel))[1]
                source = _weaker(source, "footer")
            ent = groups.setdefault(
                gval,
                [
                    0,
                    {c: [0, 0] for c in sums_cols},
                    {c: None for c in range_cols},
                ],
            )
            ent[0] += nrows
            for c in sums_cols:
                phys = phys_of[c]
                s = (smap.get(rel) or {}).get(phys) if phys else None
                if s is None:
                    return None  # a file without recorded sums: scan
                ent[1][c][0] += int(s[0])
                ent[1][c][1] += int(s[1])
            for c in range_cols:
                phys = phys_of[c]
                rng = (stats.get(rel) or {}).get(phys) if phys else None
                if rng is None:
                    # absent stats cannot distinguish all-NULL from
                    # dropped — only the scan is provably exact
                    return None
                cur = ent[2][c]
                try:
                    ent[2][c] = (
                        list(rng)
                        if cur is None
                        else [min(cur[0], rng[0]), max(cur[1], rng[1])]
                    )
                except TypeError:
                    return None  # incomparable cross-commit types
    return groups, source


def _metadata_sum(
    root: str, manifest: dict, col: str
) -> tuple[list | None, str]:
    """Exact ``[sum, n_nonnull]`` for ``col`` from the per-commit sum
    rollups (``sum_cols=`` config), or ``(None, "scan")`` when any pinned
    commit cannot vouch — pre-config commits, staged data-source writes
    (no Spark at write time), partial commits without per-file sums."""
    history = manifest.get("column_history") or {}
    csums = manifest.get("commit_sums") or {}
    total = 0
    nonnull = 0
    source = "root"
    for cid, n, subset in _commit_markers(root, manifest):
        if n == 0:
            continue
        phys = _written_name(col, _schema_fields(manifest, cid), history)
        if phys is None:
            return None, "scan"  # default-filled pre-evolution rows
        if subset is None:
            ent = (csums.get(cid) or {}).get(phys)
            if ent is None:
                return None, "scan"
            total += int(ent[0])
            nonnull += int(ent[1])
        else:
            smap = _load_sidecar(root, manifest, cid).get("sums") or {}
            source = _weaker(source, "sidecar")
            for rel in subset:
                ent = (smap.get(rel) or {}).get(phys)
                if ent is None:
                    return None, "scan"
                total += int(ent[0])
                nonnull += int(ent[1])
    return [total, nonnull], source


def _key_sort(key):
    """NULL-first total order for scalar or composite group keys."""
    if isinstance(key, (list, tuple)):
        return tuple((k is not None, k) for k in key)
    return ((key is not None, key),)


def _fast_group_by(
    root: str,
    manifest: dict,
    v: int,
    group_by: list[str],
    cols: list[str],
    sums_cols: list[str],
    where: dict | None,
    spark: SparkSession | None,
    allow_scan: bool,
) -> dict:
    """The group_by= arm of snapshot_fast_agg: sidecar rollup when every
    file's group (and its ``where`` membership) is provable, ONE Spark
    GROUP BY otherwise. ``cols`` become per-group MIN/MAX (from stamped
    per-file zone maps — every file of an identity partition belongs to
    exactly one group). Multi-column grouping emits LIST keys in the
    declared column order."""
    multi = len(group_by) > 1
    gb_out = list(group_by) if multi else group_by[0]
    rollup = None
    if not manifest.get("tombstones"):
        try:
            rollup = _group_rollup(
                root, manifest, group_by, sums_cols, cols, where
            )
        except (FileNotFoundError, RuntimeError):
            if not allow_scan:
                raise
            rollup = None
    if rollup is not None:
        groups, src = rollup
        out_groups = [
            {
                "key": list(k) if multi else k,
                "n_rows": ent[0],
                "sums": {
                    c: {
                        "value": s if nn else None,
                        "n_nonnull": nn,
                    }
                    for c, (s, nn) in ent[1].items()
                },
                "columns": {
                    c: {
                        "min": rng[0] if rng else None,
                        "max": rng[1] if rng else None,
                    }
                    for c, rng in ent[2].items()
                },
            }
            for k, ent in groups.items()
        ]
        out_groups.sort(key=lambda g: _key_sort(g["key"]))
        return {
            "version": v, "group_by": gb_out, "source": src,
            "groups": out_groups,
        }
    if not allow_scan:
        raise RuntimeError(
            f"metadata cannot answer GROUP BY {group_by} exactly for "
            f"version {v} (live tombstones or unprovable group "
            "attribution) and allow_scan=False"
        )
    if spark is None:
        raise ValueError("scan fallback required but spark=None")
    from pyspark.sql import functions as F

    df = snapshot_read(spark, root, version=v)
    for c, val in (where or {}).items():
        df = df.where(F.col(c) == F.lit(val))
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in sums_cols:
        aggs.append(F.sum(c).alias(f"__sm_{c}"))
        aggs.append(F.count(c).alias(f"__sn_{c}"))
    for c in cols:
        aggs.append(F.min(c).alias(f"__mn_{c}"))
        aggs.append(F.max(c).alias(f"__mx_{c}"))
    rows = df.groupBy(*group_by).agg(*aggs).collect()
    out_groups = []
    for r in rows:
        d = r.asDict()
        out_groups.append(
            {
                "key": (
                    [d[g] for g in group_by] if multi else d[group_by[0]]
                ),
                "n_rows": int(d["__n"]),
                "sums": {
                    c: {
                        "value": (
                            int(d[f"__sm_{c}"])
                            if d[f"__sm_{c}"] is not None
                            else None
                        ),
                        "n_nonnull": int(d[f"__sn_{c}"]),
                    }
                    for c in sums_cols
                },
                "columns": {
                    c: {"min": d[f"__mn_{c}"], "max": d[f"__mx_{c}"]}
                    for c in cols
                },
            }
        )
    out_groups.sort(key=lambda g: _key_sort(g["key"]))
    return {
        "version": v, "group_by": gb_out, "source": "scan",
        "groups": out_groups,
    }


def snapshot_fast_agg(
    root: str,
    cols: tuple[str, ...] | list[str] = (),
    *,
    sums: tuple[str, ...] | list[str] = (),
    where: dict | None = None,
    group_by: str | list[str] | None = None,
    version: int | None = None,
    spark: SparkSession | None = None,
    allow_scan: bool = True,
) -> dict:
    """COUNT(*) plus per-column MIN/MAX for a snapshot table version,
    answered from metadata where exactness is provable and from ONE Spark
    scan otherwise. ``where`` adds a conjunctive equality predicate
    (``{col: value}``): with a declared spec whose where-columns are
    IDENTITY partition transforms, membership is decided per FILE from
    the recorded partition tuples (exact both directions — identity
    files hold one value), costing O(matching commits) sidecar reads;
    any commit that cannot prove membership flips the whole call to one
    filtered scan. Returns::

        {"version": v, "n_rows": int, "rows_source": src,
         "columns": {col: {"min": .., "max": .., "source": src}}}

    where ``src`` is ``root`` (manifest rollup, zero I/O beyond the root),
    ``sidecar`` (O(partial commits) sidecar JSON reads), ``footer``
    (legacy per-file parquet footer reads — metadata, never data pages),
    or ``scan`` (the exactness fallback). ``allow_scan=False`` raises
    RuntimeError instead of scanning; ``spark`` is only required when the
    scan fallback is reachable.

    ``group_by=col`` (or a LIST of columns for composite grouping) is
    the metadata-only GROUP BY — Iceberg's partitions-metadata rollup as
    an aggregate: for IDENTITY-partitioned column(s) every file belongs
    to exactly one group, so per-group COUNT(*), SUM(sums), and
    MIN/MAX(cols) roll up from the commit sidecars' row/sum/zone-map
    entries with zero data I/O. ``where`` COMBINES with ``group_by``
    (equality over further identity columns — ``COUNT(*) WHERE lang='en'
    GROUP BY year`` stays metadata-only, with root-summary commit
    pruning before any sidecar opens). Returns::

        {"version": v, "group_by": col | [cols], "source": src,
         "groups": [{"key": value | [values], "n_rows": int,
                     "sums": {c: {"value": .., "n_nonnull": ..}},
                     "columns": {c: {"min": .., "max": ..}}}, ...]}

    sorted by key (NULL first). Any unprovable attribution (no identity
    spec, pre-spec commits, int-coerced string tuples without the
    faithful tuples_v=2 stamp, missing per-file sums, unstamped/absent
    range stats) flips the whole call to one Spark GROUP BY scan."""
    versions = snapshot_versions(root)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions under {root}")
    v = versions[-1] if version is None else version
    manifest = _load_manifest(root, v)
    fields = json.loads(manifest["schema"])["fields"]
    current = {f["name"] for f in fields}
    missing = [c for c in cols if c not in current] + [
        c for c in sums if c not in current
    ]
    if missing:
        raise ValueError(f"columns not in version {v} schema: {missing}")
    type_of = {f["name"]: f["type"] for f in fields}
    bad_sums = [
        c for c in sums
        if type_of.get(c) not in ("byte", "short", "integer", "long")
    ]
    if bad_sums:
        # same contract as sum_cols at write time: exact integer addition
        # only — the scan fallback would otherwise silently truncate a
        # float SUM through int()
        raise ValueError(
            f"sums= supports integral columns only, got {bad_sums} "
            "(store money as integer cents / a scaled long)"
        )
    if where:
        bad = [c for c in where if c not in current]
        if bad:
            raise ValueError(f"where columns not in version {v} schema: {bad}")
        if any(val is None for val in where.values()):
            raise ValueError(
                "where values must be non-NULL (equality never matches NULL)"
            )
    if group_by is not None:
        gb = [group_by] if isinstance(group_by, str) else list(group_by)
        if not gb or len(set(gb)) != len(gb):
            raise ValueError("group_by= needs distinct column name(s)")
        bad_gb = [g for g in gb if g not in current]
        if bad_gb:
            raise ValueError(
                f"group_by column(s) {bad_gb} not in version {v} schema"
            )
        overlap = set(gb) & set(where or {})
        if overlap:
            raise ValueError(
                f"column(s) {sorted(overlap)} appear in both group_by= "
                "and where= (an equality-filtered column has one group)"
            )
        return _fast_group_by(
            root, manifest, v, gb, list(cols), list(sums), where,
            spark, allow_scan,
        )

    out: dict = {"version": v, "columns": {}, "sums": {}}
    scan_cols: list[str] = []
    scan_sums: list[str] = []
    need_scan_rows = False

    if manifest.get("tombstones"):
        # MOR deletes remove rows the footers still count — only the read
        # path (which applies tombstones) is exact
        need_scan_rows = True
        scan_cols = list(cols)
        scan_sums = list(sums)
    elif where:
        try:
            part = _partition_filtered(
                root, manifest, where, list(cols), list(sums)
            )
        except (FileNotFoundError, RuntimeError):
            # missing/unreadable sidecar: metadata cannot vouch — the API
            # promises exact-or-one-scan, not exact-or-crash
            if not allow_scan:
                raise
            part = None
        if part is None:
            need_scan_rows = True
            scan_cols = list(cols)
            scan_sums = list(sums)
        else:
            n_rows, ranges, dead, src, fsums, dead_sums = part
            out["n_rows"], out["rows_source"] = n_rows, src
            for c in cols:
                if c in dead:
                    scan_cols.append(c)
                else:
                    rng = ranges[c]  # None => zero matching rows: NULLs
                    out["columns"][c] = {
                        "min": rng[0] if rng else None,
                        "max": rng[1] if rng else None,
                        "source": src,
                    }
            for c in sums:
                if c in dead_sums:
                    scan_sums.append(c)
                else:
                    s, nn = fsums[c]
                    out["sums"][c] = {
                        "value": s if nn else None, "n_nonnull": nn,
                        "source": src,
                    }
    else:
        try:
            n_rows, src = _metadata_rows(root, manifest)
            out["n_rows"], out["rows_source"] = n_rows, src
        except (FileNotFoundError, RuntimeError):
            if not allow_scan:
                raise
            need_scan_rows = True  # unreadable sidecar: degrade, don't crash
        for c in cols:
            try:
                rng, csrc = _metadata_range(root, manifest, c)
            except (FileNotFoundError, RuntimeError):
                if not allow_scan:
                    raise
                rng = None
            if rng is None:
                scan_cols.append(c)
            else:
                out["columns"][c] = {"min": rng[0], "max": rng[1], "source": csrc}
        for c in sums:
            try:
                ent, ssrc = _metadata_sum(root, manifest, c)
            except (FileNotFoundError, RuntimeError):
                if not allow_scan:
                    raise
                ent = None
            if ent is None:
                scan_sums.append(c)
            else:
                out["sums"][c] = {
                    "value": ent[0] if ent[1] else None,
                    "n_nonnull": ent[1],  # exact AVG = value / n_nonnull
                    "source": ssrc,
                }

    if need_scan_rows or scan_cols or scan_sums:
        if not allow_scan:
            what = (
                (["COUNT(*)"] if need_scan_rows else [])
                + scan_cols
                + [f"SUM({c})" for c in scan_sums]
            )
            raise RuntimeError(
                f"metadata cannot answer {what} exactly for version {v} "
                "(live tombstones or uncovered column stats) and "
                "allow_scan=False"
            )
        if spark is None:
            raise ValueError("scan fallback required but spark=None")
        from pyspark.sql import functions as F

        df = snapshot_read(spark, root, version=v)
        if where:
            for c, val in where.items():
                df = df.filter(df[c] == val)
        aggs = []
        if need_scan_rows:
            aggs.append(F.count(F.lit(1)).alias("__n"))
        for c in scan_cols:
            aggs.append(F.min(c).alias(f"__mn_{c}"))
            aggs.append(F.max(c).alias(f"__mx_{c}"))
        for c in scan_sums:
            aggs.append(F.sum(c).alias(f"__sm_{c}"))
            aggs.append(F.count(c).alias(f"__sn_{c}"))
        row = df.agg(*aggs).collect()[0].asDict()
        if need_scan_rows:
            out["n_rows"], out["rows_source"] = int(row["__n"]), "scan"
        for c in scan_cols:
            out["columns"][c] = {
                "min": row[f"__mn_{c}"], "max": row[f"__mx_{c}"],
                "source": "scan",
            }
        for c in scan_sums:
            val = row[f"__sm_{c}"]
            out["sums"][c] = {
                "value": int(val) if val is not None else None,
                "n_nonnull": int(row[f"__sn_{c}"]),
                "source": "scan",
            }
    return out
