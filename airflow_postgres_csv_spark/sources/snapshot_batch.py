"""Batch Python Data Source over snapshot tables, with filter-pushdown
file skipping: ``spark.read.format("snapshot_table").load(root)``.

The operator API (``snapshot_read`` / ``snapshot_scan`` /
``snapshot_lookup``) asks the CALLER to say which predicate should prune
files. This source moves that decision where it belongs on a 100 TB
cluster — inside the scan: Spark's planner hands the WHERE clause's
conjuncts to ``pushFilters`` (Python Data Source API, Spark 4.1), the
source intersects them into per-column ranges, and ``partitions()``
plans the file set through the SAME hierarchical pruning the operators
use (commit-level ranges from the root manifest → per-file zone maps
from the sidecars of surviving commits → per-file Bloom probes for
equality predicates on indexed columns). A plain
``spark.sql("SELECT ... WHERE ts BETWEEN ...")`` over the source prunes
files with no operator-specific plumbing at all.

Correctness contract: pruning is file-granular, so EVERY pushed filter
is also returned to Spark for post-scan evaluation (the API's
partial-pushdown form) — a false-positive file costs a scan, never a
wrong row. Executors read surviving files with pyarrow, align each
file to the version's pinned schema (default-fill for columns added by
later schema evolution, cast for widened columns), and apply the
manifest's merge-on-read tombstones as Arrow masks (equality keys and
positional (file, row) deletes) — the same semantics as
``snapshots._read_pinned``, checked against it by tests and by the
``snapshot_source_pruned`` registry oracle.

Scale notes: planning stays driver-side and O(root manifest + surviving
sidecars), exactly like the operator path; per-partition work ships as
plain picklable strings (paths + schema JSONs), and each task touches
only its one data file plus the (small) delete files that apply to it.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from airflow_postgres_csv_spark.operators import snapshots as S

__all__ = [
    "SnapshotTableDataSource",
    "register_snapshot_table",
    "snapshot_sql_register",
    "snapshot_sql_unregister",
]

_INF = float("inf")


class SnapshotBatchPartition(InputPartition):
    """One surviving data file, self-contained and picklable."""

    def __init__(
        self,
        path: str,
        rel: str,
        written_schema_json: str,
        table_schema_json: str,
        defaults_json: str,
        tomb_specs_json: str,
        history_json: str = "{}",
    ):
        self.path = path
        self.rel = rel
        self.written_schema_json = written_schema_json
        self.table_schema_json = table_schema_json
        self.defaults_json = defaults_json
        self.tomb_specs_json = tomb_specs_json
        self.history_json = history_json


def _resolve_table(options: dict) -> tuple[str, int | None]:
    """Resolve ``(table_root, pinned_version)`` from the reader options.

    Two addressing modes:

    - direct: ``load(root)`` (+ optional ``option("version", int|tag)``);
    - THROUGH A CATALOG (operators/catalog_txn.py):
      ``option("catalog", catalog_root).option("table", name)`` — the
      snapshot version comes from the catalog pin, so multi-table reads
      in one query see one transaction's mutually-consistent world;
      ``option("catalogVersion", N)`` time-travels the catalog itself
      (resolution is per catalog version, so renamed/dropped names of
      that era resolve exactly as the transaction left them).
    """
    cat = options.get("catalog")
    if cat:
        name = options.get("table")
        if not name:
            raise ValueError(
                "snapshot_table: option('catalog', ...) requires "
                "option('table', <name>)"
            )
        cv = options.get("catalogversion") or options.get("catalog_version")
        if isinstance(cv, str) and cv.lstrip("-").isdigit():
            cv = int(cv)
        from airflow_postgres_csv_spark.operators.catalog_txn import (
            catalog_state,
        )

        tables = catalog_state(cat, cv)
        if name not in tables:
            raise KeyError(
                f"table {name!r} not in catalog {cat} "
                f"(have {sorted(tables)})"
            )
        pin = tables[name]
        if "mview" in pin:
            mv = pin["mview"]
            if mv.get("version") is None:
                raise ValueError(
                    f"materialized view {name!r} has never been refreshed"
                )
            if mv.get("incremental"):
                raise ValueError(
                    f"{name!r} is an INCREMENTAL materialized view — read "
                    "it with catalog_read / snapshot_sql_register, which "
                    "hide the IVM's retraction-zeroed groups"
                )
            return mv["root"], int(mv["version"])
        if "view" in pin:
            raise ValueError(
                f"{name!r} is a catalog VIEW — read it with "
                "catalog_read(spark, catalog_root, name), which resolves "
                "the stored SQL over the version's table pins"
            )
        return pin["root"], int(pin["version"])
    root = options.get("path") or options.get("root")
    if not root:
        raise ValueError(
            "snapshot_table requires a path (load(root)) or a catalog/table "
            "option pair"
        )
    if root.startswith("file:"):
        # SQL DDL (CREATE TABLE ... USING snapshot_table) normalizes the
        # path option to a file: URI; the manifest layer wants a plain
        # local path
        from urllib.parse import unquote, urlparse

        root = unquote(urlparse(root).path)
    if branch := options.get("branch"):
        # a branch IS a root (operators/branches.py) — resolve the name
        # so WAP quarantine triage and in-flight branch state are
        # readable through the same pruned scan path (and through SQL
        # via snapshot_sql_register)
        from airflow_postgres_csv_spark.operators.branches import (
            _branch_root,
        )

        root = _branch_root(root, branch)
    v = options.get("version")
    if isinstance(v, str) and v.lstrip("-").isdigit():
        v = int(v)  # DataFrameReader options always arrive as strings
    return root, S.resolve_version(root, v)


def _tighten(rng: tuple, lo, hi) -> tuple:
    """Intersect [lo, hi] into the accumulated range, keeping the old
    bound when the pair is incomparable (conservative, never wrong)."""
    clo, chi = rng
    try:
        if clo == -_INF or lo > clo:
            clo = lo
    except TypeError:
        pass
    try:
        if chi == _INF or hi < chi:
            chi = hi
    except TypeError:
        pass
    return (clo, chi)


class SnapshotBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        # option("pushdown", "false"): plan the FULL pinned file list
        # regardless of pushed filters. Spark's Python-data-source scan
        # cache (PythonDataSourceV2.readInfo, Spark 4.1) is keyed per
        # RELATION, not per query's pushed filters — a relation reused
        # across statements (a temp view, a saved DataFrame) serves every
        # later filterless plan whatever partition list the LAST pushdown
        # computed, silently dropping files. Disabling partition pruning
        # makes every cached plan identical (the full list), so reuse is
        # always exact; Spark still re-evaluates all filters row-level.
        self._pushdown = str(options.get("pushdown", "true")).lower() != "false"
        self._root, version = _resolve_table(options)
        versions = S.snapshot_versions(self._root)
        if not versions:
            raise FileNotFoundError(f"no snapshot versions at {self._root}")
        self._manifest = S._load_manifest(
            self._root, version if version is not None else versions[-1]
        )
        # predicate state accumulated by pushFilters
        self._ranges: dict[str, tuple] = {}
        self._eq: list[tuple[str, object]] = []

    # -- planning ----------------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        # REPLACE, never accumulate: the engine hands each planning pass
        # its complete conjunct set, and the reader instance OUTLIVES one
        # query — Spark caches the relation (and its planner-worker twin)
        # across every query that references a saved DataFrame or temp
        # view. Accumulated state would intersect one query's ranges into
        # the next query's scan and silently drop rows (caught by the SQL
        # temp-view pins in tests/test_snapshot_batch_source.py).
        self._ranges = {}
        self._eq = []
        if not self._pushdown:
            yield from filters
            return
        cols = {f.name for f in self._schema().fields}
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            usable = col in cols
            if usable and isinstance(f, EqualTo):
                self._ranges[col] = _tighten(
                    self._ranges.get(col, (-_INF, _INF)), f.value, f.value
                )
                self._eq.append((col, f.value))
            elif usable and isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                self._ranges[col] = _tighten(
                    self._ranges.get(col, (-_INF, _INF)), f.value, _INF
                )
            elif usable and isinstance(f, (LessThan, LessThanOrEqual)):
                self._ranges[col] = _tighten(
                    self._ranges.get(col, (-_INF, _INF)), -_INF, f.value
                )
            elif usable and isinstance(f, In) and f.value:
                try:
                    lo, hi = min(f.value), max(f.value)
                except TypeError:
                    lo = hi = None
                if lo is not None:
                    self._ranges[col] = _tighten(
                        self._ranges.get(col, (-_INF, _INF)), lo, hi
                    )
            # file-granular pruning only: Spark must still evaluate every
            # filter on the survivors' rows
            yield f

    def _schema(self) -> StructType:
        return StructType.fromJson(json.loads(self._manifest["schema"]))

    def planned_files(self) -> list[str]:
        """The surviving file list (exposed for tests / introspection)."""
        m = self._manifest
        if self._ranges:
            kept = S._plan_scan(self._root, m, self._ranges)["kept_files"]
        else:
            kept = list(m["files"])
        cfg = m.get("bloom") or {}
        probes = [
            (c, v) for c, v in self._eq if c in cfg.get("cols", [])
        ]
        if not probes:
            return kept
        out = []
        sidecars: dict[str, dict] = {}  # one JSON read per commit, not per file
        for rel in kept:
            cid = S._commit_of(rel)
            if cid not in sidecars:
                sidecars[cid] = S._load_sidecar(self._root, m, cid)
            blooms = sidecars[cid].get("blooms", {}).get(rel, {})
            drop = False
            for c, v in probes:
                words = blooms.get(c)
                try:
                    if words is not None and not S._bloom_might_contain(
                        words, v, cfg["m"], cfg["k"]
                    ):
                        drop = True
                        break
                except (TypeError, ValueError):
                    pass  # unprobeable key type: keep the file
            if not drop:
                out.append(rel)
        return out

    def partitions(self) -> list[SnapshotBatchPartition]:
        m = self._manifest
        commit_schemas = m.get("commit_schemas", {})
        tombs = m.get("tombstones", [])
        parts = []
        planned = self.planned_files()
        # consume the pushed predicates: a filterless re-plan of the same
        # cached reader (pushFilters is only invoked when the query HAS
        # filters) must fall back to the full pinned file list, not prune
        # by the previous query's ranges
        self._ranges = {}
        self._eq = []
        for rel in planned:
            cid = S._commit_of(rel)
            specs = []
            for t in tombs:
                if not S._tombstone_applies(t, cid, rel):
                    continue
                specs.append(
                    {
                        "kind": t.get("kind", "equality"),
                        "key_col": t.get("key_col"),
                        "delete_files": [
                            os.path.join(self._root, f) for f in t["files"]
                        ],
                    }
                )
            parts.append(
                SnapshotBatchPartition(
                    path=os.path.join(self._root, rel),
                    rel=rel,
                    written_schema_json=commit_schemas.get(cid, m["schema"]),
                    table_schema_json=m["schema"],
                    defaults_json=json.dumps(m.get("defaults", {})),
                    tomb_specs_json=json.dumps(specs),
                    history_json=json.dumps(m.get("column_history", {})),
                )
            )
        return parts

    # -- execution ---------------------------------------------------------
    def read(self, partition: SnapshotBatchPartition):
        if partition is None:
            # partitions() pruned every file: the engine still schedules one
            # task with a None partition — an empty scan, not an error
            return
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        from airflow_postgres_csv_spark.operators.snapshots import (
            _written_name,
        )

        table_schema = StructType.fromJson(
            json.loads(partition.table_schema_json)
        )
        target = to_arrow_schema(table_schema)
        written = {
            f.name
            for f in StructType.fromJson(
                json.loads(partition.written_schema_json)
            ).fields
        }
        defaults = json.loads(partition.defaults_json)
        history = json.loads(partition.history_json)
        # ALTER RENAME lineage: a pre-rename file stores the old physical
        # name — resolve each target column to the name this file carries
        src_of = {
            f.name: _written_name(f.name, written, history) for f in target
        }
        tbl = pq.read_table(
            partition.path,
            columns=[s for s in src_of.values() if s is not None],
        )
        n = tbl.num_rows
        arrays = []
        for f in target:
            src = src_of[f.name]
            if src is not None:
                arrays.append(tbl.column(src).cast(f.type))
            else:
                arrays.append(pa.array([defaults.get(f.name)] * n, type=f.type))
        aligned = pa.table(arrays, schema=target)
        for spec in json.loads(partition.tomb_specs_json):
            if spec["kind"] == "positional":
                pos_tbl = pa.concat_tables(
                    [pq.read_table(f) for f in spec["delete_files"]]
                )
                mine = pos_tbl.filter(
                    pc.equal(pos_tbl["file"], partition.rel)
                )["pos"]
                idx = pa.array(range(aligned.num_rows), type=pa.int64())
                mask = pc.is_in(idx, value_set=mine.combine_chunks())
            else:
                key = spec["key_col"]
                keys = pa.concat_tables(
                    [pq.read_table(f, columns=[key]) for f in spec["delete_files"]]
                )[key]
                # `aligned` already carries CURRENT names, so the (current)
                # tombstone key column addresses it directly
                col = aligned[key]
                mask = pc.is_in(
                    col, value_set=keys.combine_chunks().cast(col.type)
                )
            aligned = aligned.filter(pc.invert(mask))
        yield from aligned.to_batches()


class SnapshotWriteMessage(WriterCommitMessage):
    def __init__(self, rels: list[str]):
        self.rels = rels


class SnapshotBatchWriter(DataSourceArrowWriter):
    """Executor-side Arrow writer + driver-side manifest commit.

    Each task streams its Arrow batches straight into one parquet file
    under the commit's immutable staging dir (``data/<commit_id>/``) —
    no driver round trip, no extra shuffle. The driver then publishes
    the staged file list through ``snapshot_commit_staged``: the SAME
    single atomic-link commit point as the operator API, so a crashed or
    aborted write leaves only an orphan dir for ``snapshot_expire`` and
    readers never observe a partial write. ``mode("append")`` requires
    the staged schema to match the table's; ``mode("overwrite")``
    replaces the pinned file list (history stays time-travelable)."""

    def __init__(self, root: str, schema: StructType, overwrite: bool):
        import uuid

        from pyspark.sql.types import StructField

        self._root = root
        # same nullability normalization (and exact json rendering) as the
        # manifest's pinned schema — the drift check compares strings
        self._schema_json = StructType(
            [StructField(f.name, f.dataType, True) for f in schema.fields]
        ).json()
        self._overwrite = overwrite
        self._commit_id = uuid.uuid4().hex[:12]
        # declared table constraints, captured at plan time from the
        # latest manifest: each TASK validates its own in-memory Arrow
        # batches before writing a byte (distributed, zero extra I/O) —
        # the only enforcement point reachable from this session-less
        # Python-data-source path
        versions = S.snapshot_versions(root)
        self._constraints = sorted(
            (
                (S._load_manifest(root, versions[-1]).get("constraints") or {})
                if versions
                else {}
            ).items()
        )

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = list(iterator)
        if not batches or sum(b.num_rows for b in batches) == 0:
            return SnapshotWriteMessage([])  # empty task: no file
        table = pa.Table.from_batches(batches)
        if self._constraints:
            import duckdb

            con = duckdb.connect()
            try:
                con.register("__staged", table)
                selects = ", ".join(
                    f"SUM(CASE WHEN NOT coalesce(({cond}), false) "
                    "THEN 1 ELSE 0 END)"
                    for _, cond in self._constraints
                )
                row = con.execute(
                    f"SELECT {selects} FROM __staged"
                ).fetchone()
            finally:
                con.close()
            violations = {
                name: int(row[i])
                for i, (name, _) in enumerate(self._constraints)
                if row[i]
            }
            if violations:
                raise ValueError(
                    f"snapshot write rejected by declared constraints: "
                    f"{violations}"
                )
        staging = os.path.join(self._root, "data", self._commit_id)
        os.makedirs(staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.parquet"
        pq.write_table(table, os.path.join(staging, name))
        return SnapshotWriteMessage([os.path.join("data", self._commit_id, name)])

    def commit(self, messages):
        rels = sorted(rel for m in messages if m for rel in m.rels)
        S.snapshot_commit_staged(
            self._root,
            self._commit_id,
            rels,
            self._schema_json,
            mode="overwrite" if self._overwrite else "append",
            retries=3,
            # every task checked exactly these rules over its in-memory
            # batches at write(); rules declared since plan time get the
            # staged-file DuckDB pass inside commit_staged
            validated_rules=self._constraints,
        )

    def abort(self, messages):
        import shutil

        shutil.rmtree(
            os.path.join(self._root, "data", self._commit_id), ignore_errors=True
        )


class SnapshotTableDataSource(DataSource):
    """``spark.read.format("snapshot_table").load(root)`` — optionally
    ``.option("version", <int or tag>)`` for time travel — and
    ``df.write.format("snapshot_table").mode("append"|"overwrite")
    .save(root)`` for atomic manifest-committed writes."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def schema(self):
        reader = SnapshotBatchReader(None, dict(self.options))
        return reader._schema()

    def reader(self, schema: StructType) -> SnapshotBatchReader:
        return SnapshotBatchReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> SnapshotBatchWriter:
        root = self.options.get("path") or self.options.get("root")
        if not root:
            raise ValueError("snapshot_table write requires a path (save(root))")
        return SnapshotBatchWriter(root, schema, overwrite)


def register_snapshot_table(spark) -> None:
    # the engine refuses to plan a reader that implements pushFilters
    # while the (runtime-settable) pushdown flag is off — enabling it at
    # registration keeps the source usable from any session.
    # Registration is memoized per session: `dataSource.register`
    # cloudpickles and ships the class on every call (~0.25 s of pure
    # driver latency), and the statement hook re-registers relations per
    # statement — without the memo every SQL statement paid it again.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    if getattr(spark, "_snapshot_table_registered", False):
        return
    spark.dataSource.register(SnapshotTableDataSource)
    spark._snapshot_table_registered = True


def _register_view_relation(spark, name: str, spec: dict, pushdown: bool):
    """(Re-)register temp view ``name`` over a FRESH relation — each
    ``load()`` is its own ``PythonDataSourceV2`` instance, so its scan
    cache starts empty (the fresh-relation safety unit)."""
    register_snapshot_table(spark)
    reader = spark.read.format("snapshot_table").option(
        "pushdown", "true" if pushdown else "false"
    )
    if spec.get("catalog") is not None:
        reader = reader.option("catalog", spec["catalog"]).option(
            "table", spec.get("table") or name
        )
        if spec.get("catalog_version") is not None:
            reader = reader.option(
                "catalogVersion", str(spec["catalog_version"])
            )
        df = reader.load()
    else:
        if spec.get("version") is not None:
            reader = reader.option("version", str(spec["version"]))
        if spec.get("branch") is not None:
            reader = reader.option("branch", spec["branch"])
        df = reader.load(spec["root"])
    df.createOrReplaceTempView(name)
    return df


def _count_python_scans(plan, ident, counts) -> bool:
    """Bump per-instance counts for every PythonTable scan LEAF of one
    plan tree; True as soon as any instance is seen twice.
    ``DataSourceV2ScanRelation`` is a leaf node, so ``collectLeaves``
    (ONE py4j round trip for the whole tree) replaces the per-node
    children()/apply() recursion that dominated this check's cost."""
    leaves = plan.collectLeaves()
    for i in range(leaves.length()):
        node = leaves.apply(i)
        if node.getClass().getSimpleName() == "DataSourceV2ScanRelation":
            tbl = node.relation().table()
            if tbl.getClass().getSimpleName() == "PythonTable":
                h = ident(tbl)
                counts[h] = counts.get(h, 0) + 1
                if counts[h] > 1:
                    return True
    return False


def _has_repeated_python_scan(spark, df) -> bool:
    """True iff some Python-data-source TABLE INSTANCE is scanned more
    than once in ``df``'s optimized plan (children AND subquery plans).

    That is exactly the shape the per-relation scan cache cannot serve
    exactly: each scan's pushFilters overwrites the one shared readInfo
    (``PythonDataSourceV2.setReadInfo``), so the last planner pass's
    partition list would feed every scan of the relation. Single-scan
    statements over a fresh relation are always exact — the cache has
    one writer (that scan's own pushdown) or none."""
    counts: dict[int, int] = {}
    ident = spark._jvm.java.lang.System.identityHashCode
    root = df._jdf.queryExecution().optimizedPlan()
    if _count_python_scans(root, ident, counts):
        return True
    # subqueriesAll is recursive (nested subqueries included) — one
    # round trip for the list, then leaves-only per subquery plan
    subs = root.subqueriesAll()
    for i in range(subs.length()):
        if _count_python_scans(subs.apply(i), ident, counts):
            return True
    return False


def _sql_views(spark) -> dict:
    reg = getattr(spark, "_snapshot_sql_views", None)
    if reg is None:
        reg = {}
        spark._snapshot_sql_views = reg
    return reg


def _sql_reuse(spark) -> dict:
    """Per-view reuse fingerprints: view -> {"sql", "state"} of the LAST
    statement that registered its relation. A repeated statement whose
    text AND table-state token both match skips the fresh-relation
    re-registration entirely — the relation's scan cache already holds
    exactly that statement's partitions."""
    reg = getattr(spark, "_snapshot_sql_reuse", None)
    if reg is None:
        reg = {}
        spark._snapshot_sql_reuse = reg
    return reg


def _spec_state(spec: dict):
    """A cheap token of the table state a version-unpinned relation
    resolves to NOW (one directory listing — ~1000x cheaper than a
    re-registration): latest snapshot version, or the catalog head for
    catalog-routed views. None = never reuse (branch heads and errors
    are conservatively fresh)."""
    try:
        if spec.get("catalog") is not None:
            if spec.get("catalog_version") is not None:
                return ("cat", spec["catalog_version"])
            from airflow_postgres_csv_spark.operators.catalog_txn import (
                catalog_versions,
            )

            vs = catalog_versions(spec["catalog"])
            return ("cat", vs[-1] if vs else None)
        if spec.get("branch") is not None:
            return None
        if spec.get("version") is not None:
            return ("v", spec["version"])
        from airflow_postgres_csv_spark.operators.snapshots import (
            snapshot_versions,
        )

        vs = snapshot_versions(spec["root"])
        return ("v", vs[-1] if vs else None)
    except Exception:
        return None


def _install_sql_hook(spark) -> None:
    """Give raw ``spark.sql`` text fresh-relation semantics for the
    pruning views in this session's registry (the Python-side analog of
    a catalog plugin — Python data sources have no session-catalog
    extension point in Spark 4.1).

    Before a statement that names a registered view runs, the view is
    re-registered over a FRESH relation (empty scan cache); after
    planning, if the statement scans the same table instance twice
    (self-join with asymmetric filters, an optimizer-duplicated CTE, a
    scalar subquery over the same view — shapes the shared cache cannot
    serve exactly), the view is swapped to a full-list relation and the
    statement replans: pruned when provably safe, never wrong.
    Statements naming no registered view pass straight through."""
    if getattr(spark, "_snapshot_sql_hook", None) is not None:
        return
    import re as _re
    import threading

    orig_sql = spark.sql
    lock = threading.Lock()

    def sql_hook(sqlQuery, *args, **kwargs):
        views = _sql_views(spark)
        if not isinstance(sqlQuery, str) or not views:
            return orig_sql(sqlQuery, *args, **kwargs)
        hit = [
            n
            for n in views
            if _re.search(rf"\b{_re.escape(n)}\b", sqlQuery, _re.IGNORECASE)
        ]
        if not hit:
            return orig_sql(sqlQuery, *args, **kwargs)
        # a statement that CREATES something over a registered view (a
        # derived temp view, CTAS, CACHE) pins THIS statement's relation
        # beyond the statement — later statements over the derived name
        # bypass the hook, so the pinned relation must be the always-safe
        # full list (pruning is lost through derived objects, exactness
        # is not)
        derives = bool(
            _re.search(r"\b(CREATE|CACHE)\b", sqlQuery, _re.IGNORECASE)
        )
        with lock:
            reuse = _sql_reuse(spark)
            if not derives and not args and not kwargs:
                # repeated-identical-statement fast path: same text, same
                # table state -> the current relation's scan cache holds
                # exactly this statement's partitions; skip the fresh
                # registration (saves the dominant per-statement cost)
                states = {n: _spec_state(views[n]) for n in hit}
                if all(
                    (ent := reuse.get(n)) is not None
                    and states[n] is not None
                    and ent["sql"] == sqlQuery
                    and ent["state"] == states[n]
                    and spark.catalog.tableExists(n)
                    for n in hit
                ):
                    return orig_sql(sqlQuery, *args, **kwargs)
            else:
                # derived objects and PARAMETERIZED statements (args bind
                # different literals into the same text -> different
                # pushed filters) never take or record the fast path
                states = {}
            reg_errs: dict[str, Exception] = {}
            for n in hit:
                try:
                    _register_view_relation(
                        spark, n, views[n], pushdown=not derives
                    )
                except Exception as exc:
                    # the table root is gone (a torn-down scratch dir):
                    # the view is dead either way — unregister so a
                    # statement that merely MENTIONS the name (a column,
                    # a string literal) is not poisoned by the registry.
                    # Keep the ORIGINAL error: the statement would
                    # otherwise surface a generic TABLE_OR_VIEW_NOT_FOUND
                    # for the alias with the dead-root cause lost
                    # (ADVICE r11 low, diagnosability).
                    views.pop(n, None)
                    reg_errs[n] = exc
            try:
                df = orig_sql(sqlQuery, *args, **kwargs)
            except Exception as exc:
                for n, cause in reg_errs.items():
                    if _re.search(
                        rf"\b{_re.escape(n)}\b", str(exc), _re.IGNORECASE
                    ):
                        raise RuntimeError(
                            f"view {n!r} was dropped from the SQL registry "
                            f"because its table failed to register: {cause}"
                        ) from exc
                raise
            # Scan-cache poisoning guard: some OPTIMIZER RULES duplicate a
            # single-referenced scan subtree without a second textual
            # occurrence (runtime bloom-filter injection clones the
            # creation side; future rules may differ), so a textual
            # "name appears once, no WITH" test is NOT a sound reason to
            # skip the plan-level check (ADVICE r11 medium). After the
            # leaf-based rewrite the check costs a handful of py4j calls
            # on the already-built optimized plan (~10 ms/statement
            # measured, vs ~1.6 s for the old per-node recursion), so it
            # runs UNCONDITIONALLY — correctness backstop first.
            if not derives and _has_repeated_python_scan(spark, df):
                for n in hit:
                    if n in views:
                        _register_view_relation(
                            spark, n, views[n], pushdown=False
                        )
                df = orig_sql(sqlQuery, *args, **kwargs)
            if not derives:
                for n in hit:
                    if n in views and states.get(n) is not None:
                        reuse[n] = {"sql": sqlQuery, "state": states[n]}
            return df

    orig_table = spark.table

    def table_hook(tableName):
        views = _sql_views(spark)
        if tableName in views:
            with lock:
                _sql_reuse(spark).pop(tableName, None)
                try:
                    # a handle the caller may save and reuse across
                    # differently-filtered queries: give it its own
                    # always-safe full-list relation (pruning stays on
                    # the statement path, where freshness is managed)
                    return _register_view_relation(
                        spark, tableName, views[tableName], pushdown=False
                    )
                except Exception:
                    views.pop(tableName, None)
        return orig_table(tableName)

    spark.sql = sql_hook
    spark.table = table_hook
    spark._snapshot_sql_hook = sql_hook


def snapshot_sql_unregister(spark, name: str) -> None:
    """Drop ``name`` from the pruning registry and the temp-view catalog
    (the statement hook stays installed but no longer touches it)."""
    _sql_views(spark).pop(name, None)
    _sql_reuse(spark).pop(name, None)
    spark.catalog.dropTempView(name)


def snapshot_sql_register(
    spark,
    name: str,
    root: str | None = None,
    *,
    version: int | str | None = None,
    branch: str | None = None,
    catalog: str | None = None,
    table: str | None = None,
    catalog_version: int | None = None,
    pushdown: bool = True,
    defer: bool = False,
):
    """Make a snapshot (or catalog-pinned) table addressable by NAME in
    raw ``spark.sql`` text: plans the scan through the ``snapshot_table``
    batch data source and registers it as a session temp view, so SQL
    queries over the view inherit the full lakehouse read path —
    manifest-pinned files, MOR tombstone masks, schema evolution
    defaults, and time travel.

    ``pushdown=True`` (the default) gives SQL text the same
    partition-level file pruning as the DataFrame path, made SAFE BY
    CONSTRUCTION against the upstream scan-cache hazard: Spark's
    Python-data-source scan cache (``PythonDataSourceV2.readInfo``,
    Spark 4.1) is per RELATION and not keyed on the pushed filters, so
    a long-lived view pinning one relation would serve a filterless
    statement the PREVIOUS statement's pruned partition list.
    Registration therefore installs a session statement hook
    (``_install_sql_hook``) that re-registers the view over a fresh
    relation before each statement naming it — each statement owns its
    cache — and falls back to an unpruned relation for the one shape a
    fresh relation cannot fix (the same table instance scanned twice in
    ONE statement with divergent filters: asymmetric self-joins,
    optimizer-duplicated CTEs, scalar subqueries over the view — the
    last scan's ``setReadInfo`` would feed both). Pruned when provably
    safe, exact always; ``pushdown=False`` opts out of the hook and
    pins a plain full-list view.

    The same cache reuse contract applies to SAVED DataFrames from
    ``spark.read.format("snapshot_table").load(root)`` — including the
    DataFrame this function returns: a saved object pins one relation,
    so run differently-filtered queries over fresh ``load()`` calls /
    ``spark.sql`` statements (cheap — planning is O(manifest)), not
    over one long-lived DataFrame handle. Statements that CREATE a
    derived object over the view (a temp view, CTAS, CACHE TABLE) pin
    an always-safe full-list relation instead, since later statements
    over the derived name bypass the hook.

    Addressing mirrors the reader options: ``root`` (+ optional
    ``version`` int or tag, + optional ``branch`` name — WAP quarantine
    triage and in-flight transaction state in plain SQL) reads one
    table directly;
    ``catalog=..., table=...`` (+ optional ``catalog_version``) resolves
    through a catalog pin so several registered views see ONE
    transaction's mutually-consistent world. Pass an explicit
    ``version``/``catalog_version`` for a stable pin — an unpinned view
    re-resolves the latest version each time the source replans.

    Returns the registered DataFrame (the same object ``spark.table(name)``
    yields). Iceberg analog: ``spark.table("cat.db.t")`` via a session
    catalog plugin; the reference has no SQL surface of its own (it
    delegates to Postgres — reference operators.py:80).
    """
    if catalog is None and root is None:
        raise ValueError(
            "snapshot_sql_register requires root= or catalog=/table="
        )
    if catalog is not None and table is not None:
        # a catalog VIEW registers as its RESOLVED DataFrame (stored SQL
        # over the pinned base tables of the addressed catalog version) —
        # spark.sql text over the name then works like any other view;
        # the base-table registrations inside catalog_read inherit the
        # same pruning-hook safety
        from airflow_postgres_csv_spark.operators.catalog_txn import (
            _is_view,
            catalog_read,
            catalog_state,
        )

        ent = catalog_state(catalog, catalog_version).get(table)
        if ent is not None and (
            _is_view(ent)
            or (isinstance(ent, dict) and (ent.get("mview") or {}).get("incremental"))
        ):
            # plain views resolve their stored SQL; INCREMENTAL mviews
            # need the n > 0 retraction mask — both register as the
            # catalog_read DataFrame rather than a raw relation
            df = catalog_read(
                spark, catalog, table, catalog_version=catalog_version
            )
            df.createOrReplaceTempView(name)
            _sql_views(spark).pop(name, None)
            return df
    spec = {
        "root": root,
        "version": version,
        "branch": branch,
        "catalog": catalog,
        "table": table,
        "catalog_version": catalog_version,
    }
    _sql_reuse(spark).pop(name, None)  # new spec: stale fingerprint dies
    if pushdown:
        _sql_views(spark)[name] = spec
        _install_sql_hook(spark)
        if defer:
            # the statement hook registers a FRESH relation before every
            # statement naming the view anyway, so an eager registration
            # here would be built only to be replaced — callers that
            # ignore the returned DataFrame (catalog view / mview
            # resolution) skip straight to the hook's registration
            return None
    else:
        _sql_views(spark).pop(name, None)
    return _register_view_relation(spark, name, spec, pushdown=pushdown)
