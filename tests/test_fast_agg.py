"""snapshot_fast_agg: metadata-only COUNT(*)/MIN/MAX with exact-or-scan
fallback — Iceberg manifest-stats aggregate pushdown, re-expressed over the
snapshot root's per-commit rollups.

The structural pins (bombed sidecar loads / footer opens / scan reads) are
the scale evidence: on the append-only fast path the answer comes from the
root manifest ALONE — O(commits) JSON already in memory, no per-file I/O —
so the same call on a 10⁶-file table stays metadata-sized.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators import fast_agg as FA
from airflow_postgres_csv_spark.operators import snapshots as S
from airflow_postgres_csv_spark.operators.fast_agg import snapshot_fast_agg
from airflow_postgres_csv_spark.operators.snapshots import (
    snapshot_alter,
    snapshot_commit,
    snapshot_compact,
    snapshot_delete,
    snapshot_delete_mor,
    snapshot_read,
    snapshot_versions,
)


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id",
        (F.col("id") % 13).alias("x"),
        F.concat(F.lit("u"), F.format_string("%03d", F.col("id") % 50)).alias(
            "tag"
        ),
    )


def _truth(spark, root, cols, version=None):
    df = snapshot_read(spark, root, version=version)
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    return df.agg(*aggs).collect()[0].asDict()


def _bomb_scan(monkeypatch):
    def bomb(*a, **k):
        raise AssertionError("data scan on the metadata-only path")

    monkeypatch.setattr(FA, "snapshot_read", bomb)


def _bomb_footers(monkeypatch):
    def bomb(path):
        raise AssertionError(f"footer open({path}) on the rollup path")

    monkeypatch.setattr(FA, "_footer_meta", bomb)


def _count_sidecars(monkeypatch):
    real = S._load_sidecar
    calls = {"n": 0}

    def counting(root, manifest, cid):
        calls["n"] += 1
        return real(root, manifest, cid)

    monkeypatch.setattr(FA, "_load_sidecar", counting)
    return calls


def test_append_only_answers_from_root_alone(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "t")
    for k in range(3):
        snapshot_commit(_batch(spark, k * 100, (k + 1) * 100).coalesce(1), root)
    want = _truth(spark, root, ["id", "x", "tag"])
    S._metadata_cache_clear()
    _bomb_scan(monkeypatch)
    _bomb_footers(monkeypatch)
    sidecars = _count_sidecars(monkeypatch)
    got = snapshot_fast_agg(
        root, ["id", "x", "tag"], spark=None, allow_scan=False
    )
    assert got["n_rows"] == want["n"] == 300
    assert got["rows_source"] == "root"
    for c in ["id", "x", "tag"]:
        assert got["columns"][c]["min"] == want[f"mn_{c}"]
        assert got["columns"][c]["max"] == want[f"mx_{c}"]
        assert got["columns"][c]["source"] == "root"
    assert sidecars["n"] == 0


def test_time_travel_version_pin(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "t")
    snapshot_commit(_batch(spark, 0, 50).coalesce(1), root)
    snapshot_commit(_batch(spark, 50, 400).coalesce(1), root)
    _bomb_scan(monkeypatch)
    got = snapshot_fast_agg(root, ["id"], version=1, allow_scan=False)
    assert got["n_rows"] == 50
    assert got["columns"]["id"] == {"min": 0, "max": 49, "source": "root"}


def test_cow_partial_commit_uses_sidecar(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "t")
    # two files in one commit, split on id so the delete touches only one
    b = _batch(spark, 0, 200)
    snapshot_commit(
        b.repartitionByRange(2, "id").sortWithinPartitions("id"), root
    )
    snapshot_delete(spark, root, "id", 0, 10)  # COW: one file rewritten
    m = S._load_manifest(root, snapshot_versions(root)[-1])
    assert any(
        isinstance(mk, list) for mk in dict.get(m, "commit_files").values()
    ), "expected a partially-retained commit"
    want = _truth(spark, root, ["id", "tag"])
    S._metadata_cache_clear()
    _bomb_scan(monkeypatch)
    _bomb_footers(monkeypatch)
    got = snapshot_fast_agg(root, ["id", "tag"], spark=None, allow_scan=False)
    assert got["n_rows"] == want["n"] == 189
    assert got["columns"]["id"]["min"] == want["mn_id"] == 11
    assert got["columns"]["id"]["max"] == want["mx_id"]
    assert got["columns"]["tag"]["min"] == want["mn_tag"]
    # the subset commit's ranges come from its sidecar's per-file stats
    assert got["rows_source"] in ("root", "sidecar")
    assert got["columns"]["id"]["source"] in ("root", "sidecar")


def test_legacy_sidecar_falls_back_to_footers(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "t")
    snapshot_commit(_batch(spark, 0, 120).coalesce(1), root)
    # simulate a pre-rowcount sidecar + 3-element rollup (legacy table)
    v = snapshot_versions(root)[-1]
    mpath = S._manifest_path(root, v)
    m = json.loads(open(mpath).read())
    for cid, ent in m["commit_sizes"].items():
        m["commit_sizes"][cid] = ent[:3]
    for rel in m["sidecars"].values():
        sc = json.loads(open(os.path.join(root, rel)).read())
        sc.pop("rows", None)
        with open(os.path.join(root, rel), "w") as f:
            json.dump(sc, f)
    with open(mpath, "w") as f:
        json.dump(m, f)
    S._metadata_cache_clear()
    _bomb_scan(monkeypatch)
    got = snapshot_fast_agg(root, ["id"], spark=None, allow_scan=False)
    assert got["n_rows"] == 120
    assert got["rows_source"] == "footer"  # metadata still — never a scan
    assert got["columns"]["id"] == {"min": 0, "max": 119, "source": "root"}


def test_tombstones_force_exact_scan(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_commit(_batch(spark, 0, 100).coalesce(1), root)
    snapshot_delete_mor(spark, root, condition="id >= 90", key_col="id")
    with pytest.raises(RuntimeError, match="allow_scan=False"):
        snapshot_fast_agg(root, ["id"], allow_scan=False)
    got = snapshot_fast_agg(root, ["id"], spark=spark)
    assert got["n_rows"] == 90 and got["rows_source"] == "scan"
    assert got["columns"]["id"] == {"min": 0, "max": 89, "source": "scan"}


def test_added_default_column_scans_that_column_only(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "t")
    snapshot_commit(_batch(spark, 0, 80).coalesce(1), root)
    snapshot_alter(root, add={"score": "long"}, column_defaults={"score": 7})
    snapshot_commit(
        _batch(spark, 80, 160)
        .withColumn("score", F.lit(2).cast("long"))
        .coalesce(1),
        root,
        allow_schema_change=True,
    )
    got = snapshot_fast_agg(root, ["id", "score"], spark=spark)
    # pre-ALTER rows surface the default 7 — only a scan can see it
    assert got["columns"]["score"] == {"min": 2, "max": 7, "source": "scan"}
    assert got["columns"]["id"]["source"] == "root"  # untouched by fallback
    assert got["n_rows"] == 160 and got["rows_source"] == "root"


def test_rename_lineage_resolves_old_physical_names(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "t")
    snapshot_commit(_batch(spark, 0, 60).coalesce(1), root)
    snapshot_alter(root, rename={"tag": "label"})
    snapshot_commit(
        _batch(spark, 60, 90).withColumnRenamed("tag", "label").coalesce(1),
        root,
    )
    want = _truth(spark, root, ["label"])
    S._metadata_cache_clear()
    _bomb_scan(monkeypatch)
    got = snapshot_fast_agg(root, ["label"], spark=None, allow_scan=False)
    assert got["columns"]["label"]["min"] == want["mn_label"]
    assert got["columns"]["label"]["max"] == want["mx_label"]
    assert got["n_rows"] == 90


def test_compaction_keeps_root_only_answers(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "t")
    for k in range(4):
        snapshot_commit(_batch(spark, k * 25, (k + 1) * 25).coalesce(1), root)
    snapshot_compact(spark, root, target_bytes=1 << 30)
    S._metadata_cache_clear()
    _bomb_scan(monkeypatch)
    _bomb_footers(monkeypatch)
    got = snapshot_fast_agg(root, ["id"], spark=None, allow_scan=False)
    assert got["n_rows"] == 100 and got["rows_source"] == "root"
    assert got["columns"]["id"] == {"min": 0, "max": 99, "source": "root"}


def test_missing_column_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_commit(_batch(spark, 0, 10).coalesce(1), root)
    with pytest.raises(ValueError, match="nope"):
        snapshot_fast_agg(root, ["nope"])


def test_footer_meta_requires_stats_in_every_row_group(tmp_path):
    """A column whose stats are absent in SOME row group (all-NULL group
    here; oversized-value stat drops in the wild) must not surface a
    merged range — it would under-cover the file for pruning and fast
    aggregates alike."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "f.parquet")
    t = pa.table(
        {
            "a": pa.array([1, 2, 3, 4], pa.int64()),
            "b": pa.array([10, 20, None, None], pa.int64()),
        }
    )
    pq.write_table(t, path, row_group_size=2)  # rg2 of b is all-NULL
    stats, n_rows = S._footer_meta(path)
    assert n_rows == 4
    assert stats["a"] == [1, 4]
    assert "b" not in stats  # conservative: not provably file-covering


def _pbatch(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id",
        F.concat(F.lit("L"), (F.col("id") % 3).cast("string")).alias("lang"),
        (F.col("id") * 2).alias("v"),
    )


def test_where_identity_partition_counts_from_metadata(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "t")
    for k in range(2):
        snapshot_commit(
            _pbatch(spark, k * 90, (k + 1) * 90),
            root,
            partition_transforms=[("lang", "identity")],
        )
    want = (
        snapshot_read(spark, root)
        .where(F.col("lang") == "L1")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()[0]
    )
    S._metadata_cache_clear()
    _bomb_scan(monkeypatch)
    got = snapshot_fast_agg(
        root, ["v"], where={"lang": "L1"}, spark=None, allow_scan=False
    )
    assert got["n_rows"] == want["n"] == 60
    assert got["columns"]["v"] == {
        "min": want["mn"], "max": want["mx"], "source": got["rows_source"]
    }
    assert got["rows_source"] in ("root", "sidecar")
    # a value no partition holds: exactly zero, NULL min/max, no scan
    none = snapshot_fast_agg(
        root, ["v"], where={"lang": "nope"}, spark=None, allow_scan=False
    )
    assert none["n_rows"] == 0
    assert none["columns"]["v"]["min"] is None


def test_where_without_identity_spec_scans(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_commit(_pbatch(spark, 0, 50).coalesce(1), root)  # no spec
    with pytest.raises(RuntimeError, match="allow_scan=False"):
        snapshot_fast_agg(root, where={"lang": "L1"}, allow_scan=False)
    got = snapshot_fast_agg(root, ["v"], where={"lang": "L1"}, spark=spark)
    truth = (
        snapshot_read(spark, root).where(F.col("lang") == "L1").count()
    )
    assert got["n_rows"] == truth and got["rows_source"] == "scan"


def test_where_pre_spec_commit_scans(spark, tmp_path):
    """A table with one pre-spec commit cannot prove membership — the
    whole call falls back (and stays exact)."""
    root = str(tmp_path / "t")
    snapshot_commit(_pbatch(spark, 0, 30).coalesce(1), root)
    snapshot_commit(
        _pbatch(spark, 30, 90),
        root,
        partition_transforms=[("lang", "identity")],
    )
    got = snapshot_fast_agg(root, where={"lang": "L0"}, spark=spark)
    truth = snapshot_read(spark, root).where(F.col("lang") == "L0").count()
    assert got["n_rows"] == truth and got["rows_source"] == "scan"


def test_where_tombstones_force_filtered_scan(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_commit(
        _pbatch(spark, 0, 90), root,
        partition_transforms=[("lang", "identity")],
    )
    snapshot_delete_mor(spark, root, condition="id < 9", key_col="id")
    got = snapshot_fast_agg(root, where={"lang": "L1"}, spark=spark)
    truth = (
        snapshot_read(spark, root).where(F.col("lang") == "L1").count()
    )
    assert got["n_rows"] == truth and got["rows_source"] == "scan"


def test_where_rejects_null_and_unknown_columns(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_commit(_pbatch(spark, 0, 10).coalesce(1), root)
    with pytest.raises(ValueError, match="non-NULL"):
        snapshot_fast_agg(root, where={"lang": None})
    with pytest.raises(ValueError, match="where columns"):
        snapshot_fast_agg(root, where={"nope": 1})


def test_where_int_identity_partition(spark, tmp_path, monkeypatch):
    """Identity on an INT column: hive-path tuples parse back as ints and
    match an int probe."""
    root = str(tmp_path / "t")
    df = spark.range(0, 80).select(
        "id", (F.col("id") % 4).alias("shard"), (F.col("id") + 7).alias("v")
    )
    snapshot_commit(
        df, root, partition_transforms=[("shard", "identity")]
    )
    S._metadata_cache_clear()
    _bomb_scan(monkeypatch)
    got = snapshot_fast_agg(
        root, ["id"], where={"shard": 2}, spark=None, allow_scan=False
    )
    assert got["n_rows"] == 20
    assert got["columns"]["id"]["min"] == 2
    assert got["columns"]["id"]["max"] == 78


def test_fast_agg_bounded_at_10k_commits(spark, tmp_path, monkeypatch):
    """Scale pin: at 10^4 commits, COUNT(*)/MIN/MAX answer from the ROOT
    manifest alone — one JSON parse, zero sidecar opens, zero footer
    reads, zero Spark jobs — inside a small wall bound."""
    import json as _json
    import time as _time

    root = str(tmp_path / "many")
    seed = snapshot_commit(_batch(spark, 0, 10).coalesce(1), root)
    n = 10_000
    m1 = S._load_manifest(root, 1)
    commit_files = dict(m1["commit_files"])
    sidecars = dict(m1["sidecars"])
    commit_ranges = dict(m1["commit_ranges"])
    commit_sizes = dict(m1["commit_sizes"])
    for i in range(n):
        cid = f"syn{i:08x}"
        rel = os.path.join("data", cid, "part-0.parquet")
        commit_files[cid] = 1
        sidecars[cid] = os.path.join("manifests", f"sc-{cid}.json")
        # stamped like the coverage-fixed writer: fast_agg only serves
        # stamped ranges as exact (unstamped vintages route to the scan)
        commit_ranges[cid] = {"id": [100 + i, 100 + i], S._STATS_V_KEY: 1}
        commit_sizes[cid] = [1, 131072, 1, 7]  # 7 rows per synthetic commit
    manifest = {
        "version": 2, "parent": 1,
        "committed_at": m1["committed_at"] + 1,
        "mode": "append", "commit_id": "syn0000270f",
        "n_files": seed["n_files"] + n, "schema": seed["schema"],
        "commit_schemas": {}, "sidecars": sidecars,
        "commit_ranges": commit_ranges, "tombstones": [],
        "commit_files": commit_files, "commit_sizes": commit_sizes,
        "small_bytes": m1["small_bytes"],
    }
    with open(S._manifest_path(root, 2), "w") as f:
        _json.dump(manifest, f)
    S._metadata_cache_clear()
    _bomb_scan(monkeypatch)
    _bomb_footers(monkeypatch)
    sidecar_calls = _count_sidecars(monkeypatch)
    t0 = _time.time()
    got = snapshot_fast_agg(root, ["id"], spark=None, allow_scan=False)
    wall = _time.time() - t0
    assert got["n_rows"] == 10 + 7 * n
    assert got["columns"]["id"] == {
        "min": 0, "max": 100 + n - 1, "source": "root"
    }
    assert got["rows_source"] == "root"
    assert sidecar_calls["n"] == 0
    assert wall < 2.0, f"fast_agg took {wall:.2f}s at {n} commits"


@pytest.mark.slow
def test_fast_agg_matches_model_over_random_histories(
    spark, tmp_path_factory
):
    """Property: after every operation of a random append / MOR-delete /
    COW-delete / compact / rename history, snapshot_fast_agg (count +
    min/max, exact-or-scan) equals the plain-Python multiset model."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_alter,
        snapshot_compact,
        snapshot_delete,
        snapshot_delete_mor,
    )

    op = st.one_of(
        st.tuples(st.just("append"), st.integers(0, 9), st.integers(1, 4)),
        st.tuples(st.just("delete_mor"), st.integers(0, 11)),
        st.tuples(st.just("cow_delete"), st.integers(0, 11), st.integers(0, 3)),
        st.tuples(st.just("compact")),
        st.tuples(st.just("rename")),
    )

    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ops=st.lists(op, min_size=2, max_size=5))
    def run(ops):
        root = str(tmp_path_factory.mktemp("fam") / "t")
        model: list[tuple[int, int]] = [(i, 0) for i in range(6)]
        snapshot_commit(
            spark.createDataFrame(model, "id long, stamp long").coalesce(1),
            root,
        )
        stamp_col = "stamp"
        for opi, o in enumerate(ops, start=1):
            kind = o[0]
            if kind == "append":
                _, lo, n = o
                rows = [(i, opi) for i in range(lo, lo + n)]
                snapshot_commit(
                    spark.createDataFrame(
                        rows, f"id long, {stamp_col} long"
                    ).coalesce(1),
                    root,
                    allow_schema_change=True,
                )
                model = model + rows
            elif kind == "delete_mor":
                _, key = o
                snapshot_delete_mor(
                    spark, root, condition=f"id = {key}", key_col="id"
                )
                model = [r for r in model if r[0] != key]
            elif kind == "cow_delete":
                _, lo, w = o
                snapshot_delete(spark, root, "id", lo, lo + w)
                model = [r for r in model if not (lo <= r[0] <= lo + w)]
            elif kind == "compact":
                snapshot_compact(spark, root, target_bytes=1 << 30)
            elif kind == "rename":
                new = stamp_col + "x"
                snapshot_alter(root, rename={stamp_col: new})
                stamp_col = new
            got = snapshot_fast_agg(root, ["id", stamp_col], spark=spark)
            assert got["n_rows"] == len(model), f"count after op {opi} {o}"
            ids = [r[0] for r in model]
            stamps = [r[1] for r in model]
            want_cols = {
                "id": (min(ids) if ids else None, max(ids) if ids else None),
                stamp_col: (
                    min(stamps) if stamps else None,
                    max(stamps) if stamps else None,
                ),
            }
            for c, (mn, mx) in want_cols.items():
                assert got["columns"][c]["min"] == mn, f"{c} min after {o}"
                assert got["columns"][c]["max"] == mx, f"{c} max after {o}"

    run()


def _sbatch(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id",
        (F.col("id") % 5).alias("g"),
        (F.col("id") * 3).alias("amt"),
    )


def test_sum_pushdown_root_only(spark, tmp_path, monkeypatch):
    """sum_cols config: SUM answers from the per-commit rollup with zero
    sidecar/footer/scan I/O; the config is sticky across later commits."""
    root = str(tmp_path / "t")
    snapshot_commit(_sbatch(spark, 0, 50).coalesce(1), root, sum_cols=["amt"])
    snapshot_commit(_sbatch(spark, 50, 120).coalesce(1), root)  # sticky
    want = snapshot_read(spark, root).agg(F.sum("amt").alias("s")).first()["s"]
    S._metadata_cache_clear()
    _bomb_scan(monkeypatch)
    _bomb_footers(monkeypatch)
    sidecars = _count_sidecars(monkeypatch)
    got = snapshot_fast_agg(root, sums=["amt"], spark=None, allow_scan=False)
    assert got["sums"]["amt"] == {
        "value": want, "n_nonnull": 120, "source": "root"
    }
    assert got["n_rows"] == 120 and sidecars["n"] == 0


def test_sum_pushdown_cow_partial_and_where(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "t")
    snapshot_commit(
        _sbatch(spark, 0, 100).repartitionByRange(2, "id")
        .sortWithinPartitions("id"),
        root, sum_cols=["amt"],
    )
    snapshot_delete(spark, root, "id", 0, 9)  # partial commit
    want = (
        snapshot_read(spark, root).agg(F.sum("amt").alias("s")).first()["s"]
    )
    S._metadata_cache_clear()
    _bomb_scan(monkeypatch)
    got = snapshot_fast_agg(root, sums=["amt"], spark=None, allow_scan=False)
    assert got["sums"]["amt"]["value"] == want
    assert got["sums"]["amt"]["source"] in ("root", "sidecar")
    # identity-partitioned table: filtered sums from matching files only
    root2 = str(tmp_path / "p")
    snapshot_commit(
        _sbatch(spark, 0, 90), root2,
        partition_transforms=[("g", "identity")], sum_cols=["amt"],
    )
    want2 = (
        snapshot_read(spark, root2).where("g = 2")
        .agg(F.sum("amt").alias("s")).first()["s"]
    )
    S._metadata_cache_clear()
    got2 = snapshot_fast_agg(
        root2, sums=["amt"], where={"g": 2}, spark=None, allow_scan=False
    )
    assert got2["sums"]["amt"]["value"] == want2
    assert got2["n_rows"] == 18


def test_sum_pushdown_fallbacks_and_validation(spark, tmp_path):
    root = str(tmp_path / "t")
    # pre-config commit: metadata cannot vouch -> one scan, still exact
    snapshot_commit(_sbatch(spark, 0, 40).coalesce(1), root)
    snapshot_commit(_sbatch(spark, 40, 70).coalesce(1), root, sum_cols=["amt"])
    got = snapshot_fast_agg(root, sums=["amt"], spark=spark)
    want = snapshot_read(spark, root).agg(F.sum("amt").alias("s")).first()["s"]
    assert got["sums"]["amt"] == {
        "value": want, "n_nonnull": 70, "source": "scan"
    }
    # tombstones force the scan path too
    snapshot_delete_mor(spark, root, condition="id < 5", key_col="id")
    got2 = snapshot_fast_agg(root, sums=["amt"], spark=spark)
    want2 = snapshot_read(spark, root).agg(F.sum("amt").alias("s")).first()["s"]
    assert got2["sums"]["amt"]["value"] == want2
    # non-integral columns refused at declaration
    with pytest.raises(ValueError, match="integral"):
        snapshot_commit(
            spark.range(3).select(F.col("id").cast("double").alias("d")),
            str(tmp_path / "x"),
            sum_cols=["d"],
        )


def test_sum_survives_compact_and_rename(spark, tmp_path, monkeypatch):
    from airflow_postgres_csv_spark.operators.snapshots import snapshot_alter

    root = str(tmp_path / "t")
    snapshot_commit(_sbatch(spark, 0, 60).coalesce(1), root, sum_cols=["amt"])
    snapshot_compact(spark, root, target_bytes=1 << 30)
    snapshot_alter(root, rename={"amt": "amount"})
    want = (
        snapshot_read(spark, root).agg(F.sum("amount").alias("s")).first()["s"]
    )
    S._metadata_cache_clear()
    _bomb_scan(monkeypatch)
    got = snapshot_fast_agg(
        root, sums=["amount"], spark=None, allow_scan=False
    )
    assert got["sums"]["amount"]["value"] == want


def test_merge_ranges_requires_stats_in_every_file():
    """A commit-level range merged from a SUBSET of the commit's files
    under-covers the commit: commit-level pruning on it could skip a
    stats-less file's matching rows, and fast_agg would serve a narrowed
    'exact' MIN/MAX. Only columns covered by EVERY file survive."""
    stats = {
        "data/c/a.parquet": {"x": [1, 5], "y": [10, 20]},
        "data/c/b.parquet": {"x": [3, 9]},  # y's stats were dropped
    }
    merged = S._merge_ranges(stats)
    assert merged == {"x": [1, 9], S._STATS_V_KEY: 1}


def test_sums_rejects_non_integral_request(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_commit(
        spark.range(5).select("id", F.col("id").cast("double").alias("d"))
        .coalesce(1),
        root,
    )
    with pytest.raises(ValueError, match="integral"):
        snapshot_fast_agg(root, sums=["d"], spark=spark)


def test_where_numeric_looking_string_partition_exact(spark, tmp_path):
    """Hive path segments int-coerce numeric-looking strings ('02134'
    and '2134' conflate), so bare parsed tuples cannot prove equality.
    The writer now records FAITHFUL tuples (string fields keep raw path
    text, stamped tuples_v=2): fresh tables answer such probes from
    metadata EXACTLY — while commits from the lossy-parse vintage
    (stamp stripped below) still flip the call to the one-scan path
    instead of silently undercounting."""
    import json as _json

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "02134"), (2, "2134"), (3, "02134"), (4, "ma")],
        "id int, zip string",
    )
    snapshot_commit(df, root, partition_transforms=[("zip", "identity")])
    got = snapshot_fast_agg(
        root, ["id"], where={"zip": "02134"}, spark=None, allow_scan=False
    )
    assert got["n_rows"] == 2 and got["rows_source"] != "scan"
    assert got["columns"]["id"]["min"] == 1
    assert got["columns"]["id"]["max"] == 3
    # '2134' must NOT pick up the '02134' files
    other = snapshot_fast_agg(
        root, where={"zip": "2134"}, spark=None, allow_scan=False
    )
    assert other["n_rows"] == 1
    # legacy vintage: strip the stamp + re-coerce the tuples like the old
    # parser did — the probe is now unprovable and the call must scan
    m = S._load_manifest(root, snapshot_versions(root)[-1])
    for sc_rel in m["sidecars"].values():
        with open(os.path.join(root, sc_rel)) as f:
            sc = _json.load(f)
        sc.pop("tuples_v", None)
        sc["partitions"] = {
            rel: [
                int(v) if isinstance(v, str) and v.isdigit() else v
                for v in tup
            ]
            for rel, tup in (sc.get("partitions") or {}).items()
        }
        with open(os.path.join(root, sc_rel), "w") as f:
            _json.dump(sc, f)
    S._metadata_cache_clear()
    with pytest.raises(RuntimeError, match="allow_scan=False"):
        snapshot_fast_agg(
            root, where={"zip": "02134"}, spark=None, allow_scan=False
        )
    legacy = snapshot_fast_agg(
        root, ["id"], where={"zip": "02134"}, spark=spark
    )
    assert legacy["n_rows"] == 2 and legacy["rows_source"] == "scan"
    # a non-numeric string key keeps the metadata fast path either way
    fast = snapshot_fast_agg(
        root, where={"zip": "ma"}, spark=None, allow_scan=False
    )
    assert fast["n_rows"] == 1 and fast["rows_source"] != "scan"


def test_where_type_mismatched_probe_scans(spark, tmp_path):
    """A probe whose Python type cannot round-trip the hive-path
    encoding for the column's declared type (float/bool literals, or a
    string literal against an int column) is unprovable from parsed
    tuples — the call scans instead of crashing on an int-vs-str
    comparison or silently excluding files."""
    root = str(tmp_path / "t")
    df = spark.range(0, 30).select("id", (F.col("id") % 3).alias("shard"))
    snapshot_commit(df, root, partition_transforms=[("shard", "identity")])
    got = snapshot_fast_agg(root, where={"shard": 1.5}, spark=spark)
    assert got["n_rows"] == 0 and got["rows_source"] == "scan"
    got = snapshot_fast_agg(root, ["id"], where={"shard": "2"}, spark=spark)
    truth = (
        snapshot_read(spark, root).where(F.col("shard") == "2").count()
    )
    assert got["n_rows"] == truth and got["rows_source"] == "scan"


def test_unstamped_legacy_ranges_route_minmax_to_scan(
    spark, tmp_path, monkeypatch
):
    """commit_ranges/sidecar stats written before the coverage fix carry
    no format stamp — their bounds may under-cover (subset-of-row-groups
    merges, truncated string stats), so MIN/MAX must fall back to the
    scan while COUNT(*) (footer row counts, never truncated) stays on
    the root path."""
    import json as _json

    root = str(tmp_path / "t")
    snapshot_commit(_batch(spark, 0, 40).coalesce(1), root)
    # strip the stamps, simulating a pre-fix engine's manifest + sidecar
    m = dict(S._load_manifest(root, 1))
    m["commit_ranges"] = {
        cid: {c: r for c, r in rngs.items() if c != S._STATS_V_KEY}
        for cid, rngs in m["commit_ranges"].items()
    }
    with open(S._manifest_path(root, 1), "w") as f:
        _json.dump(m, f)
    for sc_rel in m["sidecars"].values():
        with open(os.path.join(root, sc_rel)) as f:
            sc = _json.load(f)
        sc.pop("stats_v", None)
        with open(os.path.join(root, sc_rel), "w") as f:
            _json.dump(sc, f)
    S._metadata_cache_clear()
    with pytest.raises(RuntimeError, match="allow_scan=False"):
        snapshot_fast_agg(root, ["id"], spark=None, allow_scan=False)
    got = snapshot_fast_agg(root, ["id"], spark=spark)
    assert got["columns"]["id"] == {"min": 0, "max": 39, "source": "scan"}
    assert got["n_rows"] == 40 and got["rows_source"] == "root"
    # COUNT alone still needs no scan on the legacy vintage
    _bomb_scan(monkeypatch)
    only_n = snapshot_fast_agg(root, spark=None, allow_scan=False)
    assert only_n["n_rows"] == 40


def test_missing_sidecar_degrades_to_scan(spark, tmp_path):
    """A deleted/unreadable sidecar on a PARTIALLY-retained commit (its
    surviving file names live in the manifest, but its per-file rows/
    stats live in the lost sidecar) must degrade to the one-scan
    fallback when allow_scan=True — the API promises exact-or-one-scan,
    not exact-or-crash — and keep raising under allow_scan=False."""
    root = str(tmp_path / "t")
    snapshot_commit(
        _batch(spark, 0, 200).repartitionByRange(2, "id")
        .sortWithinPartitions("id"),
        root,
    )
    snapshot_delete(spark, root, "id", 0, 10)  # COW: one file rewritten
    m = S._load_manifest(root, snapshot_versions(root)[-1])
    subset_cids = [
        cid for cid, mk in m["commit_files"].items() if isinstance(mk, list)
    ]
    assert subset_cids, "expected a partially-retained commit"
    for cid in subset_cids:
        os.remove(os.path.join(root, m["sidecars"][cid]))
    S._metadata_cache_clear()
    with pytest.raises((FileNotFoundError, RuntimeError)):
        snapshot_fast_agg(root, ["id"], spark=None, allow_scan=False)
    got = snapshot_fast_agg(root, ["id"], spark=spark)
    # rows may still answer from footers (exact, metadata-only); the
    # ranges lost their sidecar stats and must come from the scan
    assert got["n_rows"] == 189 and got["rows_source"] in ("footer", "scan")
    assert got["columns"]["id"] == {"min": 11, "max": 199, "source": "scan"}


def test_group_by_metadata_rollup(spark, tmp_path, monkeypatch):
    """group_by=: metadata-only GROUP BY over an identity-partitioned
    column — per-group COUNT(*) and SUM roll up from the sidecars' row
    and sum maps, zero data I/O (scan bombed), across multiple commits.
    The Iceberg partitions-metadata shape as an aggregate."""

    def sgb(lo, hi):
        return spark.range(lo, hi).select(
            "id",
            F.concat(F.lit("L"), (F.col("id") % 3).cast("string"))
            .alias("lang"),
            F.when(F.col("id") % 7 == 0, None)
            .otherwise(F.col("id") * 3).alias("amt"),
        )

    root = str(tmp_path / "t")
    snapshot_commit(
        sgb(0, 60), root,
        partition_transforms=[("lang", "identity")], sum_cols=["amt"],
    )
    snapshot_commit(sgb(60, 100), root)  # spec + sum_cols are sticky
    want = {
        (r.lang): (r.n, r.s, r.nn, r.mn, r.mx)
        for r in snapshot_read(spark, root)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amt").alias("s"),
            F.count("amt").alias("nn"),
            F.min("id").alias("mn"),
            F.max("id").alias("mx"),
        )
        .collect()
    }
    S._metadata_cache_clear()
    _bomb_scan(monkeypatch)
    got = snapshot_fast_agg(
        root, ["id"], group_by="lang", sums=["amt"], spark=None,
        allow_scan=False,
    )
    assert got["source"] in ("root", "sidecar")
    assert [g["key"] for g in got["groups"]] == sorted(want)
    for g in got["groups"]:
        n, s, nn, mn, mx = want[g["key"]]
        assert g["n_rows"] == n
        assert g["sums"]["amt"] == {"value": s, "n_nonnull": nn}
        assert g["columns"]["id"] == {"min": mn, "max": mx}
    # grouping by an equality-filtered column is degenerate: refused
    with pytest.raises(ValueError, match="one group"):
        snapshot_fast_agg(root, group_by="lang", where={"lang": "L1"})


def test_group_by_falls_back_to_scan(spark, tmp_path):
    """Unprovable attribution (no identity spec / tombstones /
    numeric-looking string groups whose path tuples int-coerced) flips
    group_by to one Spark GROUP BY; allow_scan=False raises."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_delete_mor as _dmor,
    )

    # no spec at all
    root = str(tmp_path / "plain")
    snapshot_commit(_batch(spark, 0, 30).coalesce(1), root)
    with pytest.raises(RuntimeError, match="allow_scan=False"):
        snapshot_fast_agg(root, group_by="tag", allow_scan=False)
    got = snapshot_fast_agg(root, group_by="x", spark=spark)
    assert got["source"] == "scan"
    want = {
        r.x: r.n
        for r in snapshot_read(spark, root)
        .groupBy("x").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {g["key"]: g["n_rows"] for g in got["groups"]} == want
    # numeric-looking string groups: faithful tuples keep the metadata
    # path exact — '02134' and '2134' stay distinct groups
    root2 = str(tmp_path / "zips")
    snapshot_commit(
        spark.createDataFrame(
            [(1, "02134"), (2, "2134"), (3, "ma")], "id int, zip string"
        ),
        root2,
        partition_transforms=[("zip", "identity")],
    )
    got2 = snapshot_fast_agg(root2, group_by="zip", allow_scan=False)
    assert got2["source"] != "scan"
    assert [(g["key"], g["n_rows"]) for g in got2["groups"]] == [
        ("02134", 1), ("2134", 1), ("ma", 1)
    ]
    # tombstones force the scan
    root3 = str(tmp_path / "mor")
    snapshot_commit(
        _batch(spark, 0, 40).coalesce(1), root3,
        partition_transforms=[("tag", "identity")],
    )
    _dmor(spark, root3, condition="id >= 30", key_col="id")
    got3 = snapshot_fast_agg(root3, group_by="tag", spark=spark)
    assert got3["source"] == "scan"
    assert sum(g["n_rows"] for g in got3["groups"]) == 30


def test_metadata_partitions_table_record_count(spark, tmp_path):
    """The partitions metadata table exposes record_count per partition
    tuple (Iceberg's partitions-table shape) — summed from sidecar row
    maps, NULL when any member file predates per-file counts."""
    from airflow_postgres_csv_spark.operators.maintenance import (
        snapshot_metadata_table,
    )

    root = str(tmp_path / "t")
    df = spark.range(0, 90).select(
        "id", (F.col("id") % 3).alias("g")
    )
    snapshot_commit(df, root, partition_transforms=[("g", "identity")])
    parts = snapshot_metadata_table(spark, root, "partitions")
    got = {r.partition: r.record_count for r in parts.collect()}
    assert got == {"[0]": 30, "[1]": 30, "[2]": 30}
    files = snapshot_metadata_table(spark, root, "files")
    assert sum(r.record_count for r in files.collect()) == 90


def test_sum_config_follows_rename_and_refuses_drop(spark, tmp_path):
    """Renaming a summed column rewrites the sticky sum config so the
    NEXT write's rollup builder targets the new name (the old config
    would reference a missing column and crash); old commits keep
    resolving through the rename lineage. Dropping a summed column is
    refused with guidance."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_alter,
    )

    root = str(tmp_path / "t")
    snapshot_commit(_sbatch(spark, 0, 40).coalesce(1), root, sum_cols=["amt"])
    snapshot_alter(root, rename={"amt": "amount"})
    # the write that used to crash: sticky config now targets 'amount'
    snapshot_commit(
        spark.range(40, 70).select(
            "id", (F.col("id") % 5).alias("g"),
            (F.col("id") * 3).alias("amount"),
        ).coalesce(1),
        root,
    )
    want = (
        snapshot_read(spark, root).agg(F.sum("amount").alias("s")).first()["s"]
    )
    got = snapshot_fast_agg(root, sums=["amount"], spark=None, allow_scan=False)
    assert got["sums"]["amount"]["value"] == want
    with pytest.raises(ValueError, match="sum rollup config"):
        snapshot_alter(root, drop=["amount"])


def test_group_by_multi_column_metadata(spark, tmp_path):
    """Composite group keys over two identity columns roll up from the
    sidecars with zero data I/O (allow_scan=False as the gate); list
    keys in declared order, NULL-first sort."""
    root = str(tmp_path / "t")
    rows = [
        (i, ["en", "fr"][i % 2], 2020 + (i % 3), i * 10) for i in range(12)
    ]
    snapshot_commit(
        spark.createDataFrame(rows, "id int, lang string, yr int, amt int"),
        root,
        partition_transforms=[("lang", "identity"), ("yr", "identity")],
        sum_cols=["amt"],
    )
    got = snapshot_fast_agg(
        root, group_by=["lang", "yr"], sums=["amt"], allow_scan=False
    )
    assert got["source"] != "scan" and got["group_by"] == ["lang", "yr"]
    want = {
        (r["lang"], r["yr"]): (r["n"], r["s"])
        for r in spark.createDataFrame(
            rows, "id int, lang string, yr int, amt int"
        ).groupBy("lang", "yr").agg(
            F.count(F.lit(1)).alias("n"), F.sum("amt").alias("s")
        ).collect()
    }
    assert {
        tuple(g["key"]): (g["n_rows"], g["sums"]["amt"]["value"])
        for g in got["groups"]
    } == want
    # keys sorted composite NULL-first
    keys = [tuple(g["key"]) for g in got["groups"]]
    assert keys == sorted(keys)
    # duplicate / unknown group columns refused
    with pytest.raises(ValueError, match="distinct column"):
        snapshot_fast_agg(root, group_by=["lang", "lang"], spark=spark)


def test_group_by_with_where_metadata_and_pruning(spark, tmp_path):
    """where= equality COMBINES with group_by — the rollup stays
    metadata-only, and commits whose root partition summary excludes the
    probe are pruned before their sidecar is read (sidecar-open spy)."""
    import airflow_postgres_csv_spark.operators.snapshots as S_mod

    root = str(tmp_path / "t")
    mk = lambda lang, years: spark.createDataFrame(
        [(i, lang, y, (i + 1) * 100) for i, y in enumerate(years)],
        "id int, lang string, yr int, amt int",
    )
    snapshot_commit(
        mk("en", [2020, 2020, 2021]), root,
        partition_transforms=[("lang", "identity"), ("yr", "identity")],
        sum_cols=["amt"],
    )
    snapshot_commit(mk("fr", [2020, 2022]), root)
    snapshot_commit(mk("en", [2021, 2022]), root)
    got = snapshot_fast_agg(
        root, group_by="yr", sums=["amt"], where={"lang": "en"},
        allow_scan=False,
    )
    assert got["source"] != "scan"
    truth = {
        r["yr"]: (r["n"], r["s"])
        for r in snapshot_read(spark, root)
        .where("lang = 'en'")
        .groupBy("yr")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("s"))
        .collect()
    }
    assert {
        g["key"]: (g["n_rows"], g["sums"]["amt"]["value"])
        for g in got["groups"]
    } == truth
    # the all-fr commit is excluded by the ROOT summary: its sidecar is
    # never opened
    S._metadata_cache_clear()
    opened = []
    orig = S_mod._load_sidecar

    def spy(root_, manifest_, cid_):
        opened.append(cid_)
        return orig(root_, manifest_, cid_)

    S_mod._load_sidecar, FA._load_sidecar = spy, spy
    try:
        snapshot_fast_agg(
            root, group_by="yr", where={"lang": "en"}, allow_scan=False
        )
    finally:
        S_mod._load_sidecar, FA._load_sidecar = orig, orig
    vs = snapshot_versions(root)
    m = S._load_manifest(root, vs[-1])
    fr_cid = [
        cid for cid, sc_rel in m["sidecars"].items()
        if "fr" in str(
            (S._load_sidecar(root, m, cid).get("partitions") or {}).values()
        )
    ]
    assert len(opened) == 2 and all(c not in opened for c in fr_cid)
    # group_by/where overlap refused
    with pytest.raises(ValueError, match="one group"):
        snapshot_fast_agg(
            root, group_by="lang", where={"lang": "en"}, spark=spark
        )
    # where over a non-identity column: one scan, still exact
    scan = snapshot_fast_agg(
        root, group_by="yr", where={"id": 0}, spark=spark
    )
    assert scan["source"] == "scan"
    truth0 = {
        r["yr"]: r["n"]
        for r in snapshot_read(spark, root).where("id = 0").groupBy("yr")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {g["key"]: g["n_rows"] for g in scan["groups"]} == truth0
