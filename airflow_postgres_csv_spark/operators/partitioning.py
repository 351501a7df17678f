"""Iceberg-style declared partition specs (hidden partitioning) for
snapshot tables.

A partition SPEC is a list of transform fields ``(col, transform[,
arg])`` recorded in the table manifest — ``[("ts", "day"), ("user_id",
"bucket", 16)]``. Writers never materialize partition columns and
readers never filter on them: ``snapshot_commit`` derives the transform
values, writes one directory per partition tuple (Spark's
``partitionBy`` writer), and records exact per-file partition tuples in
the commit sidecar plus per-commit summaries (value ranges / bucket
bitmasks) in the ROOT manifest. The scan planner maps ordinary
predicates on the SOURCE columns through the transforms, so partition
pruning is GUARANTEED by declared metadata — unlike zone-map pruning,
it cannot decay when a commit's value range happens to straddle the
predicate. Specs are versioned: evolving the spec appends a new entry
and each commit pins the spec index it was written under, so pruning
applies every commit's own transforms (Iceberg spec-id semantics).

Transforms (all deterministic and timezone-free — temporal transforms
operate on the epoch value, never the session timezone):

- ``identity``                 int/string passthrough
- ``day|hour``                 floor(epoch_micros / unit) for
                               date/timestamp/timestamp_ntz
- ``month|year``               calendar ordinal from the UTC day
                               (months since 1970-01, years since 1970)
- ``bucket`` (arg N)           ``int(md5(str(v))[:8], 16) % N`` over the
                               same int/string canonicalization as the
                               Bloom index (false buckets would DROP
                               rows, so the hash must render identically
                               in the Spark builder and the driver prune)
- ``truncate`` (arg W)         int floor-to-W / string prefix-W

Reference parity: none (the reference delegates storage to Postgres —
/root/reference/src/airflow_postgres_csv/operators.py); public analogs
are Iceberg's partition transforms (spec/transforms.html) and Delta's
generated-column partitioning.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import os
from urllib.parse import unquote

__all__ = [
    "normalize_spec",
    "validate_spec",
    "transform_columns",
    "partition_values_from_rel",
    "commit_partition_summary",
    "map_predicates",
    "prune_commit",
    "prune_file",
]

_EPOCH = _dt.datetime(1970, 1, 1)
_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
_TEMPORAL = {"date", "timestamp", "timestamp_ntz"}


def normalize_spec(spec) -> list[list]:
    """Canonical JSON shape: list of ``[col, transform]`` or
    ``[col, transform, arg]`` lists."""
    out = []
    for f in spec:
        f = list(f)
        if len(f) == 2:
            col, tr = f
            arg = None
        elif len(f) == 3:
            col, tr, arg = f
        else:
            raise ValueError(f"partition field must be (col, transform[, arg]): {f!r}")
        if tr in ("bucket", "truncate"):
            if not isinstance(arg, int) or arg <= 0:
                raise ValueError(f"{tr} transform needs a positive int arg: {f!r}")
            out.append([col, tr, arg])
        elif tr in ("identity", "day", "hour", "month", "year"):
            if arg is not None:
                raise ValueError(f"{tr} transform takes no arg: {f!r}")
            out.append([col, tr])
        else:
            raise ValueError(f"unknown partition transform {tr!r}")
    if not out:
        raise ValueError("empty partition spec")
    return out


def validate_spec(spec: list[list], schema) -> None:
    by_name = {f.name: f.dataType.simpleString() for f in schema.fields}
    for f in spec:
        col, tr = f[0], f[1]
        if col not in by_name:
            raise ValueError(f"partition spec: no such column {col!r}")
        t = by_name[col]
        if tr in ("day", "hour", "month", "year"):
            if t not in _TEMPORAL:
                raise ValueError(
                    f"partition spec: {tr}({col}) needs a date/timestamp "
                    f"column, got {t}"
                )
            if tr == "hour" and t == "date":
                raise ValueError("partition spec: hour(date_col) is meaningless")
        elif tr in ("identity", "bucket"):
            if t not in _INT_TYPES and t != "string":
                raise ValueError(
                    f"partition spec: {tr}({col}) supports int/string "
                    f"columns only (canonical hashing/paths), got {t}"
                )
        elif tr == "truncate":
            if t not in _INT_TYPES and t != "string":
                raise ValueError(
                    f"partition spec: truncate({col}) supports int/string, got {t}"
                )


def _epoch_micros_expr(col, dtype: str):
    """Epoch-anchored microseconds, independent of the session timezone:
    TIMESTAMP (LTZ) uses its absolute instant (``unix_micros``); NTZ and
    DATE use naive arithmetic against a naive epoch."""
    from pyspark.sql import functions as F

    if dtype == "timestamp":
        return F.unix_micros(F.col(col))
    if dtype == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {col})"
        )
    return F.datediff(F.col(col), F.lit("1970-01-01")).cast("bigint") * _DAY_US


def _floordiv(expr, d: int):
    from pyspark.sql import functions as F

    return ((expr - F.pmod(expr, F.lit(d))) / d).cast("long")


def _utc_date_expr(col, dtype: str):
    from pyspark.sql import functions as F

    day = _floordiv(_epoch_micros_expr(col, dtype), _DAY_US)
    return F.date_add(F.lit("1970-01-01").cast("date"), day.cast("int"))


def transform_columns(spec: list[list], schema) -> list:
    """One Spark Column per spec field (names ``_p0.._pk``), built from
    JVM expressions only — the derivation runs inside the write's
    whole-stage codegen, no Python in the path."""
    from pyspark.sql import functions as F

    by_name = {f.name: f.dataType.simpleString() for f in schema.fields}
    cols = []
    for i, f in enumerate(spec):
        col, tr = f[0], f[1]
        dtype = by_name[col]
        if tr == "identity":
            e = F.col(col)
        elif tr == "day":
            e = _floordiv(_epoch_micros_expr(col, dtype), _DAY_US)
        elif tr == "hour":
            e = _floordiv(_epoch_micros_expr(col, dtype), _HOUR_US)
        elif tr == "year":
            e = F.year(_utc_date_expr(col, dtype)) - 1970
        elif tr == "month":
            d = _utc_date_expr(col, dtype)
            e = (F.year(d) - 1970) * 12 + F.month(d) - 1
        elif tr == "bucket":
            n = f[2]
            e = F.pmod(
                F.conv(
                    F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10
                ).cast("bigint"),
                F.lit(n),
            )
        else:  # truncate
            w = f[2]
            if dtype == "string":
                e = F.substring(F.col(col), 1, w)
            else:
                c = F.col(col).cast("bigint")
                e = c - F.pmod(c, F.lit(w))
        cols.append(e.alias(f"_p{i}"))
    return cols


def _coerce_temporal(value) -> _dt.datetime:
    if isinstance(value, str):
        value = _dt.datetime.fromisoformat(value)
    if isinstance(value, _dt.datetime):
        return value.replace(tzinfo=None) if value.tzinfo else value
    if isinstance(value, _dt.date):
        return _dt.datetime(value.year, value.month, value.day)
    raise TypeError(f"not a temporal literal: {value!r}")


def transform_literal(field: list, value):
    """Driver-side twin of :func:`transform_columns` for one literal —
    used to map a predicate bound through the transform. Must agree
    bit-for-bit with the Spark expression (a mismatch prunes live
    files). Naive timestamps are anchored at UTC, matching
    ``unix_micros`` on the stored instants."""
    tr = field[1]
    if tr == "identity":
        return value
    if tr in ("day", "hour", "month", "year"):
        dt = _coerce_temporal(value)
        delta = dt - _EPOCH  # exact integer micros (no float rounding)
        micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        unit = _DAY_US if tr == "day" else _HOUR_US
        if tr in ("day", "hour"):
            return micros // unit
        d = _EPOCH.date() + _dt.timedelta(days=micros // _DAY_US)
        if tr == "year":
            return d.year - 1970
        return (d.year - 1970) * 12 + d.month - 1
    if tr == "bucket":
        from airflow_postgres_csv_spark.operators.snapshots import _bloom_probe_key

        key = _bloom_probe_key(value)
        return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % field[2]
    # truncate
    w = field[2]
    if isinstance(value, str):
        return value[:w]
    return value - (value % w)


_ORDERED = ("identity", "day", "hour", "month", "year", "truncate")


def partition_values_from_rel(
    rel: str, n_fields: int, keep_str: list | None = None
) -> list | None:
    """Parse the hive-layout partition tuple out of one data file's rel
    path (``data/<cid>/_p0=5/_p1=xx/part-*.parquet``). Returns None for
    files written without the spec (pre-spec commits, compaction
    rewrites).

    Bare int-coercion is LOSSY for string source columns ('0123' and
    '123' both coerce to 123). ``keep_str`` (per-field booleans, derived
    from the spec + write schema via :func:`string_fields`) keeps those
    fields' raw segment text — the writer stamps sidecars produced this
    way ``tuples_v: 2`` so readers know the tuples are faithful."""
    vals: dict[int, object] = {}
    for seg in rel.split(os.sep):
        if not seg.startswith("_p") or "=" not in seg:
            continue
        name, raw = seg.split("=", 1)
        try:
            idx = int(name[2:])
        except ValueError:
            continue
        raw = unquote(raw)
        if raw == "__HIVE_DEFAULT_PARTITION__":
            vals[idx] = None
        elif keep_str is not None and idx < len(keep_str) and keep_str[idx]:
            vals[idx] = raw
        else:
            try:
                vals[idx] = int(raw)
            except ValueError:
                vals[idx] = raw
    if len(vals) != n_fields:
        return None
    return [vals[i] for i in range(n_fields)]


def string_fields(spec: list[list], schema) -> list:
    """Per-field flags: True where the hive path segment IS the source
    value verbatim (identity/truncate over a STRING column) — every
    derived transform (day/hour/month/year/bucket, int truncate) emits
    integers, which round-trip the path exactly."""
    by_name = {f.name: f.dataType.simpleString() for f in schema.fields}
    return [
        f[1] in ("identity", "truncate") and by_name.get(f[0]) == "string"
        for f in spec
    ]


def faithful_partitions(spec: list[list], schema, rels) -> tuple[dict, int]:
    """The commit sidecar's ``partitions`` map for freshly-written files
    plus the tuples vintage stamp (``2`` = faithful: string
    identity/truncate fields keep their raw path text, no int-coercion
    conflation). ONE definition so every writer that records its own
    tuples (plain commits, incremental optimize, partition-scoped
    compaction) stamps under the same rules — fast-path equality trusts
    the stamp, so divergent copies would corrupt the contract."""
    keep = string_fields(spec, schema)
    return (
        {
            rel: partition_values_from_rel(rel, len(spec), keep)
            for rel in rels
        },
        2,
    )


def commit_partition_summary(spec: list[list], tuples: list[list]) -> list:
    """Per-field commit-level rollup for the ROOT manifest: ordered
    transforms get ``[lo, hi]``; bucket(N<=64) gets a presence BITMASK
    (int); anything else (or an all-null field) gets None. O(fields) per
    commit in the root regardless of file count."""
    out = []
    for i, f in enumerate(spec):
        vals = [t[i] for t in tuples if t[i] is not None]
        if not vals:
            out.append(None)
        elif f[1] == "bucket":
            out.append(
                sum(1 << v for v in set(vals)) if f[2] <= 64 else None
            )
        else:
            try:
                out.append([min(vals), max(vals)])
            except TypeError:
                # hive-path parsing int-coerces numeric-LOOKING strings, so
                # one string column can yield mixed int/str tuples — no
                # ordered rollup exists; None just disables commit-level
                # pruning for the field (file-level tuples still prune)
                out.append(None)
    return out


def map_predicates(spec: list[list], want: dict) -> list:
    """Map conjunctive source-column ranges ``{col: (lo, hi)}`` through
    the spec: per field, ``("range", tlo, thi)`` for ordered transforms,
    ``("eq", b)`` for bucket under an equality bound, else None (no
    partition constraint derivable). Incomparable/unparseable literals
    yield None — pruning is an optimization, never a correctness
    dependency."""
    preds: list = []
    for f in spec:
        col, tr = f[0], f[1]
        bound = want.get(col)
        if bound is None:
            preds.append(None)
            continue
        lo, hi = bound
        try:
            if tr in _ORDERED:  # monotonic: a range maps to a range
                preds.append(
                    ("range", transform_literal(f, lo), transform_literal(f, hi))
                )
            elif lo == hi:  # bucket: only an exact point maps through a hash
                preds.append(("eq", transform_literal(f, lo)))
            else:
                preds.append(None)
        except (TypeError, ValueError):
            preds.append(None)
    return preds


def prune_commit(summary: list, preds: list) -> bool:
    """True when the commit-level rollup proves NO file can match. An
    incomparable summary/probe pair (hive-path tuples int-coerce
    numeric-looking strings, so a str probe can meet an int rollup)
    proves nothing — never prune on it, same contract as
    :func:`prune_file`."""
    for s, p in zip(summary, preds):
        if s is None or p is None:
            continue
        try:
            if p[0] == "range" and isinstance(s, list):
                if s[0] > p[2] or s[1] < p[1]:
                    return True
            elif p[0] == "eq":
                if isinstance(s, int) and not (s >> p[1]) & 1:
                    return True
                if isinstance(s, list) and (s[0] > p[1] or s[1] < p[1]):
                    return True
        except TypeError:
            continue
    return False


def prune_file(values: list | None, preds: list) -> bool:
    """True when one file's exact partition tuple cannot match. A None
    field value means the file holds only NULL source values for it —
    any range/eq predicate on that column excludes NULL rows."""
    if values is None:
        return False
    for v, p in zip(values, preds):
        if p is None:
            continue
        if v is None:
            return True
        if p[0] == "range":
            try:
                if v < p[1] or v > p[2]:
                    return True
            except TypeError:
                pass
        elif p[0] == "eq" and v != p[1]:
            return True
    return False
