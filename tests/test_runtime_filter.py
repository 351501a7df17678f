"""Join-time runtime file pruning (operators/runtime_filter.py): the
build side's key set must prune fact commits/files at the manifest
level BEFORE any scan is planned, without ever changing join results.

Fixture layout is deliberately adversarial in both directions:
- key-clustered commits (each commit/file owns a narrow key band) →
  zone maps should do the pruning;
- a hash-scattered column with Bloom bitsets → zone maps keep
  everything and the Bloom probes must do the pruning instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.runtime_filter import (
    runtime_filter,
    snapshot_join,
    snapshot_join_files,
)
from airflow_postgres_csv_spark.operators.snapshots import snapshot_commit


def _clustered_root(spark, tmp_path, bloom=False):
    """4 commits × 2 files, each file a contiguous 125-key band of
    id ∈ [0, 1000); ``h`` is a scattered hash-ish column."""
    root = str(tmp_path / "fact")
    for c in range(4):
        df = (
            spark.range(c * 250, (c + 1) * 250)
            .select(
                F.col("id"),
                (F.col("id") * 2654435761 % 1009).alias("h"),
                (F.col("id") * 3).alias("v"),
            )
            .repartitionByRange(2, "id")
            .sortWithinPartitions("id")
        )
        snapshot_commit(df, root, bloom_cols=["h"] if bloom else None)
    return root


def test_runtime_filter_modes(spark):
    dim = spark.range(5).select((F.col("id") * 100).alias("k"))
    f = runtime_filter(dim, "k")
    assert f["mode"] == "keys" and f["keys"] == [0, 100, 200, 300, 400]
    f = runtime_filter(dim, "k", max_keys=3)
    assert f["mode"] == "range" and (f["lo"], f["hi"]) == (0, 400)
    f = runtime_filter(dim.where("k < 0"), "k")
    assert f["mode"] == "empty"


def test_keys_mode_prunes_commits_and_files(spark, tmp_path):
    root = _clustered_root(spark, tmp_path)
    # 3 keys inside one 125-wide band: 3 commits pruned from the root
    # (sidecars never opened), 1 of the surviving commit's 2 files kept
    filt = {"mode": "keys", "keys": [300, 310, 320], "lo": 300, "hi": 320}
    plan = snapshot_join_files(root, "id", filt)
    assert plan["commits_skipped"] == 3
    assert plan["sidecars_loaded"] == 1
    assert plan["kept"] == 1 and plan["skipped"] == 7


def test_range_mode_prunes_by_envelope(spark, tmp_path):
    root = _clustered_root(spark, tmp_path)
    plan = snapshot_join_files(root, "id", {"mode": "range", "lo": 0, "hi": 130})
    assert plan["commits_skipped"] == 3 and plan["kept"] == 2
    plan = snapshot_join_files(root, "id", {"mode": "empty"})
    assert plan["kept"] == 0 and plan["commits_skipped"] == 4


def test_bloom_prunes_scattered_keys_zone_maps_cannot(spark, tmp_path):
    root = _clustered_root(spark, tmp_path, bloom=True)
    # h-values of 2 real rows: present → their files must survive; the
    # h column is scattered so every file's [min, max] spans the probes,
    # and ONLY the Bloom bitsets can skip the other files
    keys = sorted({(7 * 2654435761) % 1009, (600 * 2654435761) % 1009})
    filt = {"mode": "keys", "keys": keys, "lo": keys[0], "hi": keys[-1]}
    plan = snapshot_join_files(root, "h", filt)
    assert plan["bloom_skipped"] >= 4, plan
    got = (
        snapshot_join(
            spark, root,
            spark.createDataFrame([(k,) for k in keys], "h: long"),
            on="h",
        )
        .agg(F.sum("v"))
        .first()[0]
    )
    want = sum(r.v for r in spark.read.parquet(f"{root}/data/*/*.parquet")
               .where(F.col("h").isin(keys)).collect())
    assert got == want


def test_join_result_matches_unpruned_join(spark, tmp_path):
    root = _clustered_root(spark, tmp_path)
    dim = spark.createDataFrame(
        [(10, "a"), (260, "b"), (999, "c"), (5000, "zz")], "k: long, tag: string"
    )
    got = snapshot_join(spark, root, dim, on=("id", "k")).select(
        "id", "tag", "v"
    )
    full = spark.read.parquet(f"{root}/data/*/*.parquet")
    want = full.join(dim, full["id"] == dim["k"], "inner").select(
        "id", "tag", "v"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # left_semi flavor
    got = snapshot_join(spark, root, dim.select(F.col("k").alias("id")),
                        on="id", how="left_semi")
    assert sorted(r.id for r in got.collect()) == [10, 260, 999]


def test_outer_join_refused(spark, tmp_path):
    root = _clustered_root(spark, tmp_path)
    dim = spark.range(3).select(F.col("id"))
    with pytest.raises(ValueError, match="inner/left_semi"):
        snapshot_join(spark, root, dim, on="id", how="left")


def test_overflow_falls_back_to_range_and_stays_correct(spark, tmp_path):
    root = _clustered_root(spark, tmp_path)
    dim = spark.range(0, 200, 2).select(F.col("id").alias("k"))  # 100 keys
    got = snapshot_join(spark, root, dim, on=("id", "k"), max_keys=10).count()
    assert got == 100
