"""Streaming SOURCE over the versioned-snapshot subsystem: incremental,
exactly-once consumption of snapshot commits as a Structured Streaming
feed (the read-side counterpart of ``streaming/sinks.snapshot_stream_sink``).

This is the lakehouse "table as a stream" primitive (Delta's
``readStream.format("delta")``, Iceberg's incremental read) expressed
through Spark 4's public Python Data Source API
(``pyspark.sql.datasource``):

- **Offsets are snapshot versions.** An offset ``{"version": N}`` means
  "all commits through version N are processed". ``latestOffset`` is the
  newest manifest on disk; the engine checkpoints offsets in its WAL, so
  a restarted query resumes from the last committed version and each
  appended row is delivered exactly once — manifests are immutable, so
  replaying a version range is deterministic.
- **Partitions are appended files.** For each version in ``(start, end]``
  the planner diffs the pinned file lists of adjacent manifests (the same
  append-only contract as ``operators/snapshots.snapshot_changes``) and
  emits one ``InputPartition`` per added data file — O(appended data) per
  micro-batch, never O(table), and parallelism equals the number of new
  files.
- **Rows are Arrow batches.** ``read`` loads one parquet file with
  pyarrow and aligns it to the stream's fixed schema (default-fill added
  columns, widen-cast, prune dropped — the same per-commit
  written-schema alignment as ``snapshots._read_pinned``) entirely in
  Arrow; no per-row Python. A ``_commit_version`` column records
  provenance, Delta-CDF style.

Deliberately absent: per-trigger rate limiting (a ``maxFilesPerTrigger``
analog). Python ``DataSourceStreamReader`` exposes neither the ReadLimit
admission-control hook nor the checkpointed offset before the first
``latestOffset`` call — and the engine was observed (pyspark 4.1.2) to
accept a ``latestOffset`` answer BELOW the committed offset, record it,
and re-read the gap as duplicates. Any cap that can land below a
checkpoint the reader cannot see risks exactly that, so catch-up batches
are uncapped until the API grows admission control; bound backfills by
anchoring ``startingVersion`` instead.

Non-append commits break the "file delta is a row delta" contract and
fail the stream loudly (re-anchor downstream past the rewrite), with one
escape hatch: ``ignoreDeletes=true`` skips merge-on-read delete commits
(tombstone-only; they add no data files), for consumers that tolerate
deletes landing only in the compacted base.

Usage::

    from airflow_postgres_csv_spark.streaming.snapshot_source import register_snapshot_feed
    register_snapshot_feed(spark)
    stream = (spark.readStream.format("snapshot_feed")
              .option("root", root).load())

Scale posture: the planner touches only root manifests (O(commits+paths)
JSON since the round-6 sidecar split); per-file stats sidecars are never
read on this path. Each micro-batch's work is proportional to the data
appended in its version range, which is exactly the incremental-pipeline
contract at 100 TB.

Reference basis: the reference package moves data Postgres→CSV in bulk
(``/root/reference/src/airflow_postgres_csv/operators.py:12-98``); this
module is extension surface (SURVEY.md §2.3) with no reference analog.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from airflow_postgres_csv_spark.operators.snapshots import (
    _load_manifest,
    snapshot_versions,
)

VERSION_COL = "_commit_version"


class SnapshotFilePartition(InputPartition):
    """One appended data file of one commit: everything ``read`` needs,
    as plain picklable values (paths + schema JSON strings)."""

    def __init__(
        self,
        path: str,
        written_schema_json: str,
        stream_schema_json: str,
        defaults_json: str,
        version: int,
    ):
        self.path = path
        self.written_schema_json = written_schema_json
        self.stream_schema_json = stream_schema_json
        self.defaults_json = defaults_json
        self.version = version


class SnapshotFeedStreamReader(DataSourceStreamReader):
    """Version-offset incremental reader over immutable snapshot manifests."""

    def __init__(self, schema, options: dict):
        self._root = options.get("root")
        if not self._root:
            raise ValueError("snapshot_feed requires option 'root'")
        self._start_version = int(options.get("startingversion", 0))
        self._ignore_deletes = str(
            options.get("ignoredeletes", "false")
        ).lower() in ("true", "1")
        # The stream's schema is fixed at query start: data columns of the
        # newest manifest + the provenance column. Files written under
        # older/newer commit schemas are aligned to it in read().
        self._schema_json = schema.json()

    def initialOffset(self) -> dict:
        return {"version": self._start_version}

    def latestOffset(self) -> dict:
        versions = snapshot_versions(self._root)
        latest = versions[-1] if versions else self._start_version
        return {"version": max(latest, self._start_version)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        parts: list[InputPartition] = []
        lo, hi = int(start["version"]), int(end["version"])
        prev = _load_manifest(self._root, lo) if lo >= 1 else None
        # Column defaults are table-level state: align every file in the
        # range under the defaults of the manifest the range catches up
        # to, exactly as _read_pinned reads all pinned files under the
        # target manifest's defaults.
        end_defaults = (
            json.dumps(_load_manifest(self._root, hi).get("defaults", {}))
            if hi >= 1
            else "{}"
        )
        for v in range(lo + 1, hi + 1):
            cur = _load_manifest(self._root, v)
            prev_files = set(prev["files"]) if prev else set()
            removed = prev_files - set(cur["files"])
            if removed:
                raise ValueError(
                    f"snapshot_feed: version {v} rewrote {len(removed)} "
                    "file(s) (overwrite/compact/COW); the file delta is not "
                    "a row delta - restart the stream anchored past the "
                    "rewrite (startingVersion) or reprocess via table_diff"
                )
            prev_tombs = prev.get("tombstones", []) if prev else []
            if cur.get("tombstones", []) != prev_tombs and not self._ignore_deletes:
                raise ValueError(
                    f"snapshot_feed: version {v} changed the merge-on-read "
                    "delete set; appended-row feed cannot express deletes - "
                    "set ignoreDeletes=true to skip delete commits, or "
                    "reprocess via table_diff"
                )
            added = sorted(set(cur["files"]) - prev_files)
            commit_schemas = cur.get("commit_schemas", {})
            for rel in added:
                cid = rel.split("/")[1] if "/" in rel else ""
                parts.append(
                    SnapshotFilePartition(
                        path=os.path.join(self._root, rel),
                        written_schema_json=commit_schemas.get(
                            cid, cur["schema"]
                        ),
                        stream_schema_json=self._schema_json,
                        defaults_json=end_defaults,
                        version=v,
                    )
                )
            prev = cur
        return parts

    def read(self, partition: SnapshotFilePartition):
        # Static and stateless per the API contract: all inputs ride on the
        # partition value; imports are local so the reader pickles small.
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        stream_schema = StructType.fromJson(
            json.loads(partition.stream_schema_json)
        )
        target = to_arrow_schema(stream_schema)
        written = {
            f.name for f in StructType.fromJson(
                json.loads(partition.written_schema_json)
            ).fields
        }
        defaults = json.loads(partition.defaults_json)
        data_fields = [f for f in target if f.name != VERSION_COL]
        tbl = pq.read_table(
            partition.path, columns=[f.name for f in data_fields if f.name in written]
        )
        n = tbl.num_rows
        arrays = []
        for f in data_fields:
            if f.name in written:
                arrays.append(tbl.column(f.name).cast(f.type))
            else:
                # column added by a later schema evolution: default-fill,
                # exactly as snapshots._read_pinned does JVM-side
                fill = defaults.get(f.name)
                arrays.append(pa.array([fill] * n, type=f.type))
        if any(f.name == VERSION_COL for f in target):
            ver_type = target.field(VERSION_COL).type
            arrays.append(pa.array([partition.version] * n, type=ver_type))
        out = pa.table(arrays, schema=target)
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        # Offsets are engine-checkpointed; manifests are immutable, so a
        # replayed range re-reads identically. Nothing to persist here.
        pass


class SnapshotFeedDataSource(DataSource):
    """``format("snapshot_feed")``: a snapshot dataset as a stream."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_feed"

    def schema(self):
        from pyspark.sql.types import LongType, StructField, StructType

        root = self.options.get("root")
        if not root:
            raise ValueError("snapshot_feed requires option 'root'")
        versions = snapshot_versions(root)
        if not versions:
            raise FileNotFoundError(f"no snapshot versions at {root}")
        manifest = _load_manifest(root, versions[-1])
        base = StructType.fromJson(json.loads(manifest["schema"]))
        return StructType(
            list(base.fields) + [StructField(VERSION_COL, LongType(), False)]
        )

    def streamReader(self, schema) -> SnapshotFeedStreamReader:
        return SnapshotFeedStreamReader(schema, dict(self.options))


def register_snapshot_feed(spark) -> None:
    """Idempotently register the ``snapshot_feed`` streaming format on a
    session (Python data sources are session-scoped)."""
    spark.dataSource.register(SnapshotFeedDataSource)
