"""Versioned snapshot datasets: manifest-pinned parquet with time travel.

The missing primitive between "a directory of parquet" and a full lakehouse
table format: training-data pipelines need *reproducible dataset versions*
("the run was trained on v12") and *append-without-rewrite* ingestion. This
module provides both with nothing but parquet + JSON manifests, the same
core mechanism as Iceberg/Delta (a commit is one atomic metadata swap that
pins an explicit file list):

- ``snapshot_commit(df, root)`` writes the new rows as parquet under an
  immutable per-commit directory (existing files are NEVER rewritten), then
  publishes ``manifests/v{N}.json`` listing every data file of the new
  version. The manifest is written to a temp name and ``os.link``ed into
  place — a single-file atomic commit point that FAILS if a concurrent
  writer got there first (first-writer-wins optimistic concurrency, the
  local stand-in for an object store's conditional PUT): readers either
  see v(N-1) or vN, never a torn state, and a crash mid-write leaves only
  an orphaned data directory that ``snapshot_expire`` collects.
- ``snapshot_read(spark, root, version=...)`` reads the EXACT file list the
  manifest pins. Concurrent commits cannot perturb a running read, and at
  cloud scale the manifest replaces the recursive object-store listing
  (the classic S3 LIST bottleneck: O(files) requests before the first byte
  of data) with one small JSON read.
- ``snapshot_diff`` compares two versions at file granularity — O(manifest)
  set arithmetic, no data scan.
- ``snapshot_expire`` drops old manifests and deletes data files no
  retained version references (the GC that makes compaction/append cheap
  to run forever).

100 TB notes: a commit's cost is the write of its OWN rows plus one JSON
rename — independent of table size, so hourly appends to a petabyte table
stay O(batch). Schema is pinned in the manifest (JSON of the Spark schema)
and commits reject drift unless ``allow_schema_change=True`` — silent
column-type divergence between appends is the classic poisoned-table
failure. Local filesystem ``os.rename`` stands in for the object-store
atomic swap (S3 conditional PUT / HDFS rename); no reference analog
(extension surface, SURVEY.md §2.3).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "manifests"
_DATA_DIR = "data"


def _schema_json(df: DataFrame) -> str:
    """Schema pinned in the manifest, nullability-normalized: parquet
    storage is nullable regardless of the writing DataFrame's flags, so
    two frames differing only in nullability are the same table schema."""
    from pyspark.sql.types import StructField, StructType

    norm = StructType(
        [StructField(f.name, f.dataType, True) for f in df.schema.fields]
    )
    return norm.json()


class SnapshotConflictError(RuntimeError):
    """Another writer published this version first (optimistic concurrency:
    the manifest link failed because the target exists). The losing commit's
    data directory is left as an orphan for ``snapshot_expire``; re-run the
    commit to retry against the new latest version."""


class SnapshotExpectationError(ValueError):
    """A write-audit-publish expectation failed; the commit was aborted and
    the staged files removed. ``violations`` maps rule name → row count."""

    def __init__(self, violations: dict[str, int]):
        self.violations = violations
        super().__init__(f"snapshot commit rejected by expectations: {violations}")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"v{version:06d}.json")


def snapshot_versions(root: str) -> list[int]:
    """Committed versions, ascending. [] for a fresh/absent root."""
    mdir = os.path.join(root, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _load_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _footer_stats(path: str) -> dict:
    """Per-column [min, max] for one parquet file, merged across its row
    groups, from footer metadata only. Columns whose statistics are absent
    or non-JSON-serializable (nested, binary) are omitted — pruning then
    simply never skips on them (safe default)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    out: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            name = col.path_in_schema
            if "." in name:  # nested — not a prunable top-level column
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes) or isinstance(mx, bytes):
                continue
            if isinstance(mn, (int, float, str, bool)) and isinstance(
                mx, (int, float, str, bool)
            ):
                if name in out:
                    out[name] = [min(out[name][0], mn), max(out[name][1], mx)]
                else:
                    out[name] = [mn, mx]
    return out


def _build_blooms(
    spark: SparkSession, root: str, rel_files: list[str], cols: list[str], m: int, k: int
) -> dict:
    """Per-file Bloom bitsets for ``cols`` over ``rel_files`` — ONE Spark
    job for all files and columns (grouped by input_file_name), collecting
    ≤ files × cols × m/63 tiny (word_idx, word) rows to the driver. Same
    md5 Kirsch-Mitzenmacher probe scheme as operators/sketches.bloom_build,
    so membership is replayable from any engine."""
    from pyspark.sql import functions as F

    from airflow_postgres_csv_spark.operators.sketches import _bloom_bits

    paths = [os.path.join(root, rel) for rel in rel_files]
    by_base = {os.path.basename(rel): rel for rel in rel_files}
    df = spark.read.parquet(*paths)
    parts = []
    for c in cols:
        bit = F.explode(F.array(*_bloom_bits(F.col(c).cast("string"), k, m)))
        parts.append(
            df.select(
                F.input_file_name().alias("_f"), F.lit(c).alias("_c"), bit.alias("_bit")
            )
        )
    allbits = parts[0]
    for p in parts[1:]:
        allbits = allbits.unionByName(p)
    rel = (
        allbits.select(
            "_f",
            "_c",
            (F.col("_bit") / 63).cast("int").alias("_widx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit % 63 AS INT))").alias("_m"),
        )
        .groupBy("_f", "_c", "_widx")
        .agg(F.bit_or("_m").alias("_w"))
        .collect()
    )
    out: dict = {}
    for r in rel:
        relpath = by_base.get(os.path.basename(r._f))
        if relpath is None:
            continue
        out.setdefault(relpath, {}).setdefault(r._c, {})[str(r._widx)] = r._w
    return out


def _bloom_might_contain(words: dict, value, m: int, k: int) -> bool:
    """Driver-side probe of one per-file bitset (words: word_idx→int64)."""
    import hashlib

    h = hashlib.md5(str(value).encode()).hexdigest()
    h1, h2 = int(h[0:8], 16), int(h[8:16], 16)
    for i in range(k):
        bit = (h1 + i * h2) % m
        w = words.get(str(bit // 63), 0)
        if not (w & (1 << (bit % 63))):
            return False
    return True


def snapshot_commit(
    df: DataFrame,
    root: str,
    mode: str = "append",
    allow_schema_change: bool = False,
    expect: list[tuple[str, str]] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 4096,
    bloom_hashes: int = 4,
) -> dict:
    """Commit ``df`` as a new version; returns the new manifest dict.

    ``mode='append'`` pins previous files + the new ones; ``'overwrite'``
    pins only the new ones (old files stay on disk for time travel until
    ``snapshot_expire`` collects them). The commit point is the atomic
    rename of the manifest JSON — a crash before it leaves the dataset at
    the previous version with only an orphaned data dir to GC.

    ``expect`` is the write-audit-publish gate: ``(name, sql_bool_expr)``
    row-level expectations evaluated over the STAGED files after the write
    but before the manifest publishes. Any violation aborts the commit
    (the staging dir is removed, ``SnapshotExpectationError`` carries the
    per-rule violation counts) and readers never observe the bad batch —
    the batch-level contract enforcement every ingest pipeline needs, with
    the audit reading the exact bytes that would have become the version.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    versions = snapshot_versions(root)
    prev = _load_manifest(root, versions[-1]) if versions else None
    schema_json = _schema_json(df)
    if prev is not None and mode == "append" and not allow_schema_change:
        if prev["schema"] != schema_json:
            raise ValueError(
                "schema drift on append: pass allow_schema_change=True to "
                "accept (old vs new schema differ)"
            )
    commit_id, new_files = _write_data(df, root)
    if expect and new_files:
        from pyspark.sql import functions as F

        staged = df.sparkSession.read.parquet(
            *[os.path.join(root, rel) for rel in new_files]
        )
        # NULL rule results count as violations (a rule that cannot decide
        # a row has not been satisfied by it)
        counts = staged.agg(
            *[
                F.sum(
                    (~F.coalesce(F.expr(cond), F.lit(False))).cast("long")
                ).alias(name)
                for name, cond in expect
            ]
        ).first()
        violations = {
            name: int(counts[name]) for name, _ in expect if counts[name]
        }
        if violations:
            shutil.rmtree(os.path.join(root, _DATA_DIR, commit_id), ignore_errors=True)
            raise SnapshotExpectationError(violations)
    files = list(prev["files"]) + new_files if (prev and mode == "append") else new_files
    # Zone maps: per-file column min/max lifted from the parquet FOOTERS the
    # write just produced — metadata-only, no data scan. Carried forward for
    # inherited files, so manifest-level pruning covers the whole version.
    carried = prev.get("stats", {}) if (prev and mode == "append") else {}
    # Bloom index: enabled by bloom_cols on any commit, then sticky (the
    # config is inherited from the previous manifest so later plain appends
    # keep indexing without re-passing parameters).
    bloom_cfg = (
        {"cols": list(bloom_cols), "m": bloom_bits, "k": bloom_hashes}
        if bloom_cols
        else (prev.get("bloom") if prev else None)
    )
    carried_blooms = prev.get("blooms", {}) if (prev and mode == "append") else {}
    return _publish(
        root, versions, mode, commit_id, files, new_files, carried, schema_json,
        bloom_cfg=bloom_cfg, carried_blooms=carried_blooms, spark=df.sparkSession,
    )


def _write_data(df: DataFrame, root: str) -> tuple[str, list[str]]:
    """Write ``df`` under an immutable per-commit dir; return its relative
    parquet paths. No manifest is touched — a crash here leaves only an
    orphan for ``snapshot_expire``."""
    commit_id = uuid.uuid4().hex[:12]
    data_dir = os.path.join(root, _DATA_DIR, commit_id)
    df.write.mode("error").parquet(data_dir)
    new_files = sorted(
        os.path.join(_DATA_DIR, commit_id, name)
        for name in os.listdir(data_dir)
        if name.endswith(".parquet") and not name.startswith(("_", "."))
    )
    return commit_id, new_files


def _publish(
    root: str,
    versions: list[int],
    mode: str,
    commit_id: str,
    files: list[str],
    new_files: list[str],
    carried_stats: dict,
    schema_json: str,
    bloom_cfg: dict | None = None,
    carried_blooms: dict | None = None,
    spark: SparkSession | None = None,
) -> dict:
    """Assemble and atomically publish the next manifest."""
    stats = dict(carried_stats)
    for rel in new_files:
        stats[rel] = _footer_stats(os.path.join(root, rel))
    stats = {rel: stats[rel] for rel in files if rel in stats}
    version = (versions[-1] + 1) if versions else 1
    manifest = {
        "version": version,
        "parent": versions[-1] if versions else None,
        "mode": mode,
        "commit_id": commit_id,
        "files": files,
        "n_files": len(files),
        "schema": schema_json,
        "stats": stats,
    }
    if bloom_cfg:
        blooms = dict(carried_blooms or {})
        if new_files and spark is not None:
            blooms.update(
                _build_blooms(
                    spark, root, new_files, bloom_cfg["cols"],
                    bloom_cfg["m"], bloom_cfg["k"],
                )
            )
        manifest["bloom"] = bloom_cfg
        manifest["blooms"] = {rel: blooms[rel] for rel in files if rel in blooms}
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(root, version) + f".tmp-{commit_id}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    # Atomic commit point with first-writer-wins optimistic concurrency:
    # link() fails if the target exists (rename would silently clobber a
    # concurrent writer's manifest — a lost commit). The loser's data dir
    # stays as an orphan for snapshot_expire; the caller retries.
    try:
        os.link(tmp, _manifest_path(root, version))
    except FileExistsError:
        os.unlink(tmp)
        raise SnapshotConflictError(
            f"version {version} was published by a concurrent writer"
        ) from None
    os.unlink(tmp)
    return manifest


def snapshot_read(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (default: latest) via its exact file list.

    The VERSION's schema (from the manifest) is applied explicitly, not
    inferred from whichever file the reader samples — so after an
    ``allow_schema_change`` append, files written before a column existed
    read as NULL in that column, files from before a column was dropped
    have it pruned, and time travel always returns each version under its
    own schema. (Type changes to an existing column still require a
    rewrite — the parquet reader cannot reinterpret old pages.)
    """
    versions = snapshot_versions(root)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {root}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(f"version {version} not in {versions}")
    manifest = _load_manifest(root, version)
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(manifest["schema"]))
    paths = [os.path.join(root, rel) for rel in manifest["files"]]
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def snapshot_diff(root: str, v_old: int, v_new: int) -> dict:
    """File-level diff between two versions — manifest set arithmetic,
    no data scan. Returns relative paths added and removed."""
    old = set(_load_manifest(root, v_old)["files"])
    new = set(_load_manifest(root, v_new)["files"])
    return {
        "added": sorted(new - old),
        "removed": sorted(old - new),
        "unchanged": len(old & new),
    }


def _as_ranges(col_or_ranges, lo, hi) -> dict:
    """Accept either (col, lo, hi) scalars or a {col: (lo, hi)} dict."""
    if isinstance(col_or_ranges, dict):
        return col_or_ranges
    return {col_or_ranges: (lo, hi)}


def snapshot_scan(
    spark: SparkSession,
    root: str,
    col=None,
    lo=None,
    hi=None,
    version: int | None = None,
    ranges: dict | None = None,
) -> DataFrame:
    """Range scan with MANIFEST-level file skipping: files whose zone map
    ``[min, max]`` is disjoint from the requested range on ANY predicate
    column are never handed to Spark at all. Single-column form
    ``snapshot_scan(spark, root, col, lo, hi)`` or conjunctive multi-column
    form ``snapshot_scan(spark, root, ranges={"x": (x0, x1), "y": (y0, y1)})``
    — the multi-column case is where Z-order-clustered commits pay off:
    interleaved layout gives every file a tight extent on BOTH columns, so
    a small 2-D query window skips all but a handful of files (a
    1-D-sorted layout prunes only its sort column).

    This is the layer above parquet's own row-group pruning: at 100 TB the
    driver-side cost of *planning* a scan (listing + footer reads for
    thousands of files) dominates short queries; the manifest answers the
    file-skip question from one JSON. Skipping is safe-by-construction —
    a file is dropped only when a recorded range cannot intersect — and
    the residual in-file filter is still applied (and pushed down) on the
    survivors. Files with no recorded stats for a column are scanned.
    """
    want = _as_ranges(ranges if ranges is not None else col, lo, hi)
    versions = snapshot_versions(root)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {root}")
    if version is None:
        version = versions[-1]
    manifest = _load_manifest(root, version)
    stats = manifest.get("stats", {})
    keep = []
    for rel in manifest["files"]:
        fstats = stats.get(rel, {})
        disjoint = False
        for c, (clo, chi) in want.items():
            rng = fstats.get(c)
            if rng is not None and (rng[0] > chi or rng[1] < clo):
                disjoint = True  # provably cannot match — skip the file
                break
        if not disjoint:
            keep.append(rel)
    from pyspark.sql import functions as F

    pred = None
    for c, (clo, chi) in want.items():
        p = F.col(c).between(clo, chi)
        pred = p if pred is None else (pred & p)
    if not keep:
        from pyspark.sql.types import StructType

        empty = spark.createDataFrame(
            [], StructType.fromJson(json.loads(manifest["schema"]))
        )
        return empty.where(pred)
    return spark.read.parquet(
        *[os.path.join(root, rel) for rel in keep]
    ).where(pred)


def snapshot_scan_files(
    root, col=None, lo=None, hi=None, version: int | None = None, ranges: dict | None = None
) -> dict:
    """Planning-only twin of ``snapshot_scan``: how many files the zone
    maps keep vs skip — the observable tests pin. ``no_stats`` counts kept
    files that lacked stats on at least one predicate column."""
    want = _as_ranges(ranges if ranges is not None else col, lo, hi)
    versions = snapshot_versions(root)
    if version is None:
        version = versions[-1]
    manifest = _load_manifest(root, version)
    stats = manifest.get("stats", {})
    kept = skipped = unknown = 0
    for rel in manifest["files"]:
        fstats = stats.get(rel, {})
        disjoint = False
        missing = False
        for c, (clo, chi) in want.items():
            rng = fstats.get(c)
            if rng is None:
                missing = True
            elif rng[0] > chi or rng[1] < clo:
                disjoint = True
                break
        if disjoint:
            skipped += 1
        else:
            kept += 1
            if missing:
                unknown += 1
    return {"kept": kept, "skipped": skipped, "no_stats": unknown}


def snapshot_lookup_files(root: str, col: str, value, version: int | None = None) -> dict:
    """Planning-only: per-file keep/skip decision for a point lookup,
    combining the zone map (range disjointness) with the per-file Bloom
    bitset (membership). A file survives only if BOTH say it might hold
    the value; files without stats/bloom for ``col`` are kept."""
    versions = snapshot_versions(root)
    if version is None:
        version = versions[-1]
    manifest = _load_manifest(root, version)
    stats = manifest.get("stats", {})
    blooms = manifest.get("blooms", {})
    cfg = manifest.get("bloom") or {}
    use_bloom = col in cfg.get("cols", [])
    kept, skipped = [], 0
    for rel in manifest["files"]:
        rng = stats.get(rel, {}).get(col)
        if rng is not None and not (rng[0] <= value <= rng[1]):
            skipped += 1
            continue
        if use_bloom:
            words = blooms.get(rel, {}).get(col)
            if words is not None and not _bloom_might_contain(
                words, value, cfg["m"], cfg["k"]
            ):
                skipped += 1
                continue
        kept.append(rel)
    return {"kept": kept, "skipped": skipped}


def snapshot_lookup(
    spark: SparkSession, root: str, col: str, value, version: int | None = None
) -> DataFrame:
    """Point lookup ``col = value`` with manifest-level file skipping.

    Zone maps only help when the key correlates with file layout; a
    hash-distributed key spans every file's [min, max], so range pruning
    keeps everything. The per-file Bloom bitsets (built at commit time,
    ~0.5 KB per file per column at the default 4096 bits) answer the
    membership question instead: at 100 TB a primary-key lookup touches
    the handful of files that might contain the key — with false
    positives only costing extra scans, never wrong results. The residual
    equality filter still applies on the survivors.
    """
    plan = snapshot_lookup_files(root, col, value, version)
    from pyspark.sql import functions as F

    if not plan["kept"]:
        versions = snapshot_versions(root)
        manifest = _load_manifest(root, version or versions[-1])
        from pyspark.sql.types import StructType

        empty = spark.createDataFrame(
            [], StructType.fromJson(json.loads(manifest["schema"]))
        )
        return empty.where(F.col(col) == F.lit(value))
    return spark.read.parquet(
        *[os.path.join(root, rel) for rel in plan["kept"]]
    ).where(F.col(col) == F.lit(value))


def snapshot_changes(
    spark: SparkSession, root: str, v_old: int, v_new: int
) -> DataFrame:
    """Row-level change feed for an append-only version range: the rows of
    every file present in ``v_new`` but not ``v_old``.

    This is the incremental-consumption primitive: a downstream job that
    processed v_old catches up to v_new by scanning ONLY the delta files —
    O(appended data), never O(table). Raises if the range removed files
    (an overwrite/compaction landed in between): the file delta is then not
    a row delta, and the caller must fall back to a full diff
    (``operators/merge.table_diff``) or anchor past the rewrite.
    """
    old_m = _load_manifest(root, v_old)
    new_m = _load_manifest(root, v_new)
    old_files, new_files = set(old_m["files"]), set(new_m["files"])
    removed = old_files - new_files
    if removed:
        raise ValueError(
            f"versions {v_old}->{v_new} rewrote {len(removed)} file(s); the "
            "file delta is not a row delta — use a full table_diff instead"
        )
    added = sorted(new_files - old_files)
    if not added:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(json.loads(new_m["schema"])))
    return spark.read.parquet(*[os.path.join(root, rel) for rel in added])


def snapshot_compact(
    spark: SparkSession, root: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Rewrite the latest version's files into ``ceil(bytes/target)`` files
    as a NEW overwrite commit — same rows, fewer files.

    Unlike directory-swap compaction (``dataset.compact_dataset``), the
    snapshot version makes maintenance safe by construction: readers pinned
    to any version keep their exact file list (no missing-path window at
    all), time travel across the compaction still works, and the small
    files are reclaimed later by ``snapshot_expire`` once no retained
    version references them.
    """
    import math

    versions = snapshot_versions(root)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {root}")
    manifest = _load_manifest(root, versions[-1])
    total = sum(
        os.path.getsize(os.path.join(root, rel)) for rel in manifest["files"]
    )
    n_out = max(1, math.ceil(total / target_bytes))
    df = snapshot_read(spark, root).repartition(n_out)
    new_m = snapshot_commit(df, root, mode="overwrite")
    new_m["files_before"] = manifest["n_files"]
    return new_m


def snapshot_merge(
    spark: SparkSession, root: str, updates: DataFrame, key: str
) -> dict:
    """Copy-on-write MERGE (upsert by ``key``) as a new version: rows whose
    key appears in ``updates`` are replaced, new keys are inserted.

    File-granular rewrite driven by the zone maps: only files whose
    recorded ``key`` range intersects the update key range are read and
    rewritten (matched rows dropped via anti-join, then the updates
    appended); every other file is inherited into the new manifest
    verbatim. At 100 TB this is the difference between rewriting the
    touched partitions and rewriting the table — the same copy-on-write
    contract as Iceberg/Delta MERGE. Files with no recorded key stats are
    conservatively treated as candidates (correctness over skipping).

    ``updates`` must be unique per key and schema-identical to the table.
    The driver reads only the updates' key bounds (one tiny aggregate).
    """
    versions = snapshot_versions(root)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {root}")
    manifest = _load_manifest(root, versions[-1])
    if manifest["schema"] != _schema_json(updates):
        raise ValueError("snapshot_merge: updates schema differs from table schema")
    from pyspark.sql import functions as F

    lo, hi = updates.agg(F.min(key), F.max(key)).first()
    if lo is None:  # empty updates — metadata-only no-op commit
        return _publish(
            root, versions, "merge", uuid.uuid4().hex[:12],
            list(manifest["files"]), [], manifest.get("stats", {}),
            manifest["schema"],
            bloom_cfg=manifest.get("bloom"),
            carried_blooms=manifest.get("blooms", {}),
            spark=spark,
        )
    stats = manifest.get("stats", {})
    candidates, untouched = [], []
    for rel in manifest["files"]:
        rng = stats.get(rel, {}).get(key)
        if rng is not None and (rng[0] > hi or rng[1] < lo):
            untouched.append(rel)
        else:
            candidates.append(rel)
    if candidates:
        current = spark.read.parquet(
            *[os.path.join(root, rel) for rel in candidates]
        )
        rewritten = current.join(
            updates.select(key), key, "left_anti"
        ).unionByName(updates)
    else:
        rewritten = updates
    commit_id, new_files = _write_data(rewritten, root)
    files = untouched + new_files
    carried = {rel: stats[rel] for rel in untouched if rel in stats}
    blooms = manifest.get("blooms", {})
    return _publish(
        root, versions, "merge", commit_id, files, new_files, carried,
        manifest["schema"],
        bloom_cfg=manifest.get("bloom"),
        carried_blooms={rel: blooms[rel] for rel in untouched if rel in blooms},
        spark=spark,
    )


def snapshot_delete(
    spark: SparkSession, root: str, col: str, lo, hi
) -> dict:
    """Copy-on-write range DELETE (``lo <= col <= hi``) as a new version.

    Same file-granular contract as ``snapshot_merge``: zone maps pick the
    candidate files, each is rewritten without the matching rows, all
    others are inherited verbatim — O(touched range), not O(table). A
    candidate whose rows are all deleted simply contributes no output file.
    """
    versions = snapshot_versions(root)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {root}")
    manifest = _load_manifest(root, versions[-1])
    stats = manifest.get("stats", {})
    candidates, untouched = [], []
    for rel in manifest["files"]:
        rng = stats.get(rel, {}).get(col)
        if rng is not None and (rng[0] > hi or rng[1] < lo):
            untouched.append(rel)
        else:
            candidates.append(rel)
    if not candidates:  # nothing can match — metadata-only version bump
        return _publish(
            root, versions, "delete", uuid.uuid4().hex[:12],
            untouched, [], stats, manifest["schema"],
            bloom_cfg=manifest.get("bloom"),
            carried_blooms=manifest.get("blooms", {}),
            spark=spark,
        )
    from pyspark.sql import functions as F

    kept_rows = spark.read.parquet(
        *[os.path.join(root, rel) for rel in candidates]
    ).where(~F.col(col).between(lo, hi))
    commit_id, new_files = _write_data(kept_rows, root)
    files = untouched + new_files
    carried = {rel: stats[rel] for rel in untouched if rel in stats}
    blooms = manifest.get("blooms", {})
    return _publish(
        root, versions, "delete", commit_id, files, new_files, carried,
        manifest["schema"],
        bloom_cfg=manifest.get("bloom"),
        carried_blooms={rel: blooms[rel] for rel in untouched if rel in blooms},
        spark=spark,
    )


def snapshot_expire(root: str, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` manifests and delete data
    files (and then-empty commit dirs) no retained version references.

    Orphaned commit dirs from crashed commits (data written, manifest
    rename never happened) are collected too: they are unreferenced by
    construction. Time travel to an expired version stops working — that
    is the contract (pin retention to the reproducibility window).
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = snapshot_versions(root)
    keep = versions[-keep_last:]
    drop = [v for v in versions if v not in keep]
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_load_manifest(root, v)["files"])
    removed_files = 0
    data_root = os.path.join(root, _DATA_DIR)
    if os.path.isdir(data_root):
        for commit_id in sorted(os.listdir(data_root)):
            cdir = os.path.join(data_root, commit_id)
            if not os.path.isdir(cdir):
                continue
            for name in sorted(os.listdir(cdir)):
                rel = os.path.join(_DATA_DIR, commit_id, name)
                full = os.path.join(cdir, name)
                keep_file = rel in referenced or (
                    # parquet sidecars (_SUCCESS, .crc) live and die with
                    # their commit dir
                    not name.endswith(".parquet")
                    and any(r.startswith(os.path.join(_DATA_DIR, commit_id)) for r in referenced)
                )
                if not keep_file:
                    os.remove(full)
                    if name.endswith(".parquet"):
                        removed_files += 1
            if not os.listdir(cdir):
                shutil.rmtree(cdir)
    for v in drop:
        os.remove(_manifest_path(root, v))
    return {
        "expired_versions": drop,
        "kept_versions": keep,
        "removed_data_files": removed_files,
    }
