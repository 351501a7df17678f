"""Two-table join IVM (snapshots.snapshot_incremental_join_agg): keep
``SELECT g, aggs(amount) FROM A JOIN B ON k GROUP BY g`` in sync with
both sources across appends AND deletes via the signed delta algebra
``ΔJ = ΔA ⋈ B1 + A0 ⋈ ΔB`` — time travel supplies A0, never a shadow
copy; each refresh is ONE commit carrying both applied stamps.

No reference analog (the reference delegates joins and aggregation to
Postgres, reference operators.py:80); this is the Materialize/DBSP-style
delta-join maintenance discipline on lakehouse commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.snapshots import (
    _load_manifest,
    snapshot_commit,
    snapshot_delete_mor,
    snapshot_incremental_join_agg,
    snapshot_read,
    snapshot_versions,
)


def _truth(spark, a_root, b_root, aggs):
    a = snapshot_read(spark, a_root)
    b = snapshot_read(spark, b_root)
    j = a.join(b, "k", "inner")
    exprs = []
    if "count" in aggs:
        exprs.append(F.count(F.lit(1)).alias("n"))
    if "sum" in aggs:
        exprs.append(F.sum("amt").cast("long").alias("total"))
    if "min" in aggs:
        exprs.append(F.min("amt").alias("mn"))
    if "max" in aggs:
        exprs.append(F.max("amt").alias("mx"))
    return {
        r["g"]: tuple(r[i] for i in range(1, len(exprs) + 1))
        for r in j.groupBy("g").agg(*exprs).collect()
    }


def _served(spark, dst, cols):
    rows = (
        snapshot_read(spark, dst).where(F.col("n") > 0).collect()
    )
    return {r["g"]: tuple(r[c] for c in cols) for r in rows}


def test_join_ivm_appends_and_deletes_both_sides(spark, tmp_path):
    """Group column on the B side, amount on the A side — refreshes after
    appends to A, appends to B, a MOR delete on A (min displacement),
    and a delete on B (whole join groups retract) all match the
    recompute truth; stamps advance exactly once per refresh."""
    ra, rb, dst = (str(tmp_path / x) for x in ("a", "b", "dst"))
    aggs = ("count", "sum", "min", "max")
    snapshot_commit(
        spark.createDataFrame(
            [(1, 10, 100), (2, 20, 200), (3, 10, 50), (4, 30, 70)],
            "id int, k int, amt int",
        ),
        ra,
    )
    snapshot_commit(
        spark.createDataFrame(
            [(10, "x"), (20, "y"), (40, "z")], "k int, g string"
        ),
        rb,
    )
    out = snapshot_incremental_join_agg(
        spark, ra, rb, dst, on="k", group_col="g", amount_col="amt",
        aggs=aggs,
    )
    assert out == {"applied_through": {"a": 1, "b": 1}, "refreshed": True}
    cols = ("n", "total", "mn", "mx")
    assert _served(spark, dst, cols) == _truth(spark, ra, rb, aggs)
    # no-op refresh: nothing advanced
    again = snapshot_incremental_join_agg(
        spark, ra, rb, dst, on="k", group_col="g", amount_col="amt",
        aggs=aggs,
    )
    assert again["refreshed"] is False

    # append to A: ΔA ⋈ B1 path (k=40 row now matches B's z group)
    snapshot_commit(
        spark.createDataFrame(
            [(5, 40, 999), (6, 10, 1)], "id int, k int, amt int"
        ),
        ra, mode="append",
    )
    snapshot_incremental_join_agg(
        spark, ra, rb, dst, on="k", group_col="g", amount_col="amt",
        aggs=aggs,
    )
    assert _served(spark, dst, cols) == _truth(spark, ra, rb, aggs)

    # append to B: A0 ⋈ ΔB path (k=30 rows were dark, now join)
    snapshot_commit(
        spark.createDataFrame([(30, "x")], "k int, g string"),
        rb, mode="append",
    )
    snapshot_incremental_join_agg(
        spark, ra, rb, dst, on="k", group_col="g", amount_col="amt",
        aggs=aggs,
    )
    assert _served(spark, dst, cols) == _truth(spark, ra, rb, aggs)

    # MOR delete on A retracts the x-group minimum (amt=1) — the
    # retraction-scoped recompute must restore min from the live join
    snapshot_delete_mor(spark, ra, "id = 6", "id")
    snapshot_incremental_join_agg(
        spark, ra, rb, dst, on="k", group_col="g", amount_col="amt",
        aggs=aggs,
    )
    assert _served(spark, dst, cols) == _truth(spark, ra, rb, aggs)

    # delete on B: every joined row of k=20 retracts (group y zeroes)
    snapshot_delete_mor(spark, rb, "k = 20", "k")
    snapshot_incremental_join_agg(
        spark, ra, rb, dst, on="k", group_col="g", amount_col="amt",
        aggs=aggs,
    )
    truth = _truth(spark, ra, rb, aggs)
    assert "y" not in truth
    assert _served(spark, dst, cols) == truth
    # zeroed groups stay as n=0 rows (exactly-once: no second commit)
    raw = {
        r["g"]: r["n"] for r in snapshot_read(spark, dst).collect()
    }
    assert raw.get("y") == 0
    # both stamps ride the head commit
    head = _load_manifest(dst, snapshot_versions(dst)[-1])
    assert head["ivm_applied_a"] == snapshot_versions(ra)[-1]
    assert head["ivm_applied_b"] == snapshot_versions(rb)[-1]


def test_join_ivm_renamed_keys_and_validation(spark, tmp_path):
    """{a_col: b_col} join-key mapping; shared non-key columns and
    rewinding up_to are refused up front."""
    ra, rb, dst = (str(tmp_path / x) for x in ("a", "b", "dst"))
    snapshot_commit(
        spark.createDataFrame(
            [(1, 10, 5), (2, 20, 7)], "id int, custkey int, amt int"
        ),
        ra,
    )
    snapshot_commit(
        spark.createDataFrame(
            [(10, "gold"), (20, "iron")], "c_custkey int, seg string"
        ),
        rb,
    )
    snapshot_incremental_join_agg(
        spark, ra, rb, dst, on={"custkey": "c_custkey"},
        group_col="seg", amount_col="amt",
    )
    got = {
        r["seg"]: (r["n"], r["total"])
        for r in snapshot_read(spark, dst).where("n > 0").collect()
    }
    assert got == {"gold": (1, 5), "iron": (1, 7)}

    # shared non-key column refused
    rb2 = str(tmp_path / "b2")
    snapshot_commit(
        spark.createDataFrame(
            [(10, 1, "gold")], "c_custkey int, id int, seg string"
        ),
        rb2,
    )
    with pytest.raises(ValueError, match="share non-key columns"):
        snapshot_incremental_join_agg(
            spark, ra, rb2, str(tmp_path / "d2"),
            on={"custkey": "c_custkey"}, group_col="seg",
            amount_col="amt",
        )

    # up_to at/behind the applied stamps on BOTH sides: silent no-op
    # (the catalog's stamp check owns the out-of-band diagnosis); a
    # MIXED rewind — one side behind, the other advancing — is refused
    snapshot_commit(
        spark.createDataFrame([(3, 10, 9)], "id int, custkey int, amt int"),
        ra, mode="append",
    )
    snapshot_incremental_join_agg(
        spark, ra, rb, dst, on={"custkey": "c_custkey"},
        group_col="seg", amount_col="amt",
    )
    assert not snapshot_incremental_join_agg(
        spark, ra, rb, dst, on={"custkey": "c_custkey"},
        group_col="seg", amount_col="amt", up_to_a=1, up_to_b=1,
    )["refreshed"]
    snapshot_commit(
        spark.createDataFrame([(30, "tin")], "c_custkey int, seg string"),
        rb, mode="append",
    )
    with pytest.raises(ValueError, match="never rewinds"):
        snapshot_incremental_join_agg(
            spark, ra, rb, dst, on={"custkey": "c_custkey"},
            group_col="seg", amount_col="amt", up_to_a=1,
        )


def test_join_ivm_multi_group_and_key_fanout(spark, tmp_path):
    """Multi-column group keys (composite merge key) and join-key fanout
    (one B row matching many A rows, duplicate keys in A) keep multiset
    semantics exact; a key-heavy delta exceeds the IN-list cap and takes
    the semi-join restriction path."""
    ra, rb, dst = (str(tmp_path / x) for x in ("a", "b", "dst"))
    rows = [(i, i % 4, i % 3, i) for i in range(60)]
    snapshot_commit(
        spark.createDataFrame(rows, "id int, k int, g1 int, amt int"), ra
    )
    snapshot_commit(
        spark.createDataFrame(
            [(0, "e"), (1, "o"), (2, "e"), (3, "o")], "k int, g2 string"
        ),
        rb,
    )
    kw = dict(
        on="k", group_col=["g1", "g2"], amount_col="amt",
        aggs=("count", "sum"), key_pushdown_cap=2,
    )
    snapshot_incremental_join_agg(spark, ra, rb, dst, **kw)

    def truth():
        j = snapshot_read(spark, ra).join(snapshot_read(spark, rb), "k")
        return {
            (r["g1"], r["g2"]): (r["n"], r["t"])
            for r in j.groupBy("g1", "g2").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("amt").cast("long").alias("t"),
            ).collect()
        }

    def served():
        return {
            (r["g1"], r["g2"]): (r["n"], r["total"])
            for r in snapshot_read(spark, dst).where("n > 0").collect()
        }

    assert served() == truth()
    # delta touching 4 distinct keys > cap=2: semi-join path
    snapshot_commit(
        spark.createDataFrame(
            [(100 + i, i % 4, 2, 1000 + i) for i in range(8)],
            "id int, k int, g1 int, amt int",
        ),
        ra, mode="append",
    )
    snapshot_incremental_join_agg(spark, ra, rb, dst, **kw)
    assert served() == truth()


def test_join_ivm_catalog_mview(spark, tmp_path):
    """create_mview(incremental={..., on}) binds TWO sources (A then B);
    refresh folds both deltas exactly to the catalog pins via the
    delta-join, reads project the declared surface, and the served dst
    version is the one whose TWO stamps match the pins (out-of-band
    advances surface as CatalogConflictError, never stale-ahead data)."""
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        CatalogConflictError,
        catalog_ddl,
        catalog_pin_tables,
        catalog_read,
        catalog_refresh_mview,
        catalog_txn,
    )

    cat = str(tmp_path / "cat")
    ra, rb, mv = (str(tmp_path / x) for x in ("orders", "cust", "mv"))
    orders = spark.createDataFrame(
        [(1, 10, 500), (2, 20, 300), (3, 10, 200)],
        "o_id int, o_custkey int, price int",
    )
    cust = spark.createDataFrame(
        [(10, "BUILDING"), (20, "AUTO")], "c_custkey int, seg string"
    )
    catalog_txn(cat, [
        {"name": "orders", "root": ra, "df": orders},
        {"name": "cust", "root": rb, "df": cust},
    ])
    catalog_ddl(cat, [{
        "op": "create_mview", "name": "seg_rev",
        "tables": {"o": "orders", "c": "cust"}, "root": mv,
        "incremental": {
            "group_cols": ["seg"], "amount_col": "price",
            "aggs": ["count", "sum", "avg", "min", "max"],
            "on": {"o_custkey": "c_custkey"},
        },
    }])
    assert catalog_refresh_mview(spark, cat, "seg_rev")["refreshed"]

    def served():
        return {
            r["seg"]: (r["n"], r["total"], r["avg"], r["mn"], r["mx"])
            for r in catalog_read(spark, cat, "seg_rev").collect()
        }

    assert served() == {
        "BUILDING": (2, 700, 350.0, 200, 500),
        "AUTO": (1, 300, 300.0, 300, 300),
    }
    assert not catalog_refresh_mview(spark, cat, "seg_rev")["refreshed"]

    # move BOTH sides: new order for a new customer + delete the AUTO
    # customer (his order's joined row retracts), pin, refresh
    snapshot_commit(
        spark.createDataFrame([(4, 30, 50)], "o_id int, o_custkey int, price int"),
        ra, mode="append",
    )
    snapshot_commit(
        spark.createDataFrame([(30, "BUILDING")], "c_custkey int, seg string"),
        rb, mode="append",
    )
    snapshot_delete_mor(spark, rb, "c_custkey = 20", "c_custkey")
    catalog_pin_tables(cat, {"orders": (ra, 2), "cust": (rb, 3)})
    assert catalog_refresh_mview(spark, cat, "seg_rev")["refreshed"]
    assert served() == {"BUILDING": (3, 750, 250.0, 50, 500)}

    # orders advances v3 AND v4; one out-of-band direct join-IVM folds
    # both (stamp_a jumps 2 -> 4, no commit stamped 3). Pinning orders at
    # the SKIPPED v3 has no matching materialization: the refresh must
    # refuse rather than serve content ahead of the recorded pins —
    # while pinning at v4 finds the stamped commit and publishes honestly.
    for oid, price in ((5, 9000), (6, 1000)):
        snapshot_commit(
            spark.createDataFrame(
                [(oid, 10, price)], "o_id int, o_custkey int, price int"
            ),
            ra, mode="append",
        )
    snapshot_incremental_join_agg(
        spark, ra, rb, mv, on={"o_custkey": "c_custkey"},
        group_col="seg", amount_col="price",
        aggs=("count", "sum", "avg", "min", "max"),
    )
    catalog_pin_tables(cat, {"orders": (ra, 3)})
    with pytest.raises(CatalogConflictError, match="out-of-band"):
        catalog_refresh_mview(spark, cat, "seg_rev")
    catalog_pin_tables(cat, {"orders": (ra, 4)})
    assert catalog_refresh_mview(spark, cat, "seg_rev")["refreshed"]
    assert served()["BUILDING"] == (5, 10750, 2150.0, 50, 9000)


def test_join_ivm_batch_replay_exactly_once(spark, tmp_path):
    """join_ivm_batch replayed with the same batch id (post-crash
    restart) skips the fact ingest via the batch-id gate and the rollup
    catch-up no-ops — counts never double; a crash BETWEEN the two steps
    (fact committed, rollup not) self-heals on the replay because the
    join IVM reads from its own applied stamps."""
    from airflow_postgres_csv_spark.streaming.sinks import (
        join_ivm_batch,
        snapshot_batch_commit,
    )

    ra, rb, dst = (str(tmp_path / x) for x in ("a", "b", "dst"))
    snapshot_commit(
        spark.createDataFrame([(10, "x"), (20, "y")], "k int, g string"), rb
    )
    b0 = spark.createDataFrame([(1, 10, 5), (2, 20, 7)], "id int, k int, amt int")
    assert join_ivm_batch(b0, 0, ra, rb, dst, "k", "g", "amt")
    served = lambda: {
        (r["g"], r["n"], r["total"])
        for r in snapshot_read(spark, dst).where("n > 0").collect()
    }
    want = {("x", 1, 5), ("y", 1, 7)}
    assert served() == want
    # full replay of the same batch: ingest skipped, rollup unchanged
    assert not join_ivm_batch(b0, 0, ra, rb, dst, "k", "g", "amt")
    assert served() == want
    assert snapshot_versions(ra) == [1]
    # crash window: batch 1 lands in A but the rollup step dies before
    # running — the replay folds the missing delta exactly once
    b1 = spark.createDataFrame([(3, 10, 100)], "id int, k int, amt int")
    assert snapshot_batch_commit(b1, 1, ra)
    assert join_ivm_batch(b1, 1, ra, rb, dst, "k", "g", "amt") is False
    assert served() == {("x", 2, 105), ("y", 1, 7)}


def test_join_ivm_stamps_survive_maintenance_and_rollback(spark, tmp_path):
    """ivm_applied_a/_b are STICKY manifest keys: a maintenance commit on
    the rollup dst (compaction) inherits them, and a rollback restores
    the TARGET's stamps so the next refresh re-folds exactly the deltas
    whose content was rolled back — the monotone-scan contract
    _max_stamp and the catalog's binary stamp search rely on."""
    from airflow_postgres_csv_spark.operators.snapshots import (
        snapshot_compact,
        snapshot_rollback,
    )

    ra, rb, dst = (str(tmp_path / x) for x in ("a", "b", "dst"))
    snapshot_commit(
        spark.createDataFrame([(1, 10, 5)], "id int, k int, amt int"), ra
    )
    snapshot_commit(
        spark.createDataFrame([(10, "x")], "k int, g string"), rb
    )
    kw = dict(on="k", group_col="g", amount_col="amt")
    snapshot_incremental_join_agg(spark, ra, rb, dst, **kw)
    # maintenance on the dst: the stamps ride through the compaction
    snapshot_compact(spark, dst)
    head = _load_manifest(dst, snapshot_versions(dst)[-1])
    assert head["ivm_applied_a"] == 1 and head["ivm_applied_b"] == 1
    # advance + refresh, then roll the dst back: stamps rewind WITH the
    # content, so the re-run refresh folds the delta again (no gap)
    snapshot_commit(
        spark.createDataFrame([(2, 10, 7)], "id int, k int, amt int"),
        ra, mode="append",
    )
    snapshot_incremental_join_agg(spark, ra, rb, dst, **kw)
    v_before = snapshot_versions(dst)[-2]
    snapshot_rollback(spark, dst, v_before)
    head = _load_manifest(dst, snapshot_versions(dst)[-1])
    assert head["ivm_applied_a"] == 1  # rewound with the content
    out = snapshot_incremental_join_agg(spark, ra, rb, dst, **kw)
    assert out["refreshed"]
    got = {
        (r["g"], r["n"], r["total"])
        for r in snapshot_read(spark, dst).where("n > 0").collect()
    }
    assert got == {("x", 2, 12)}


def test_join_ivm_rejects_float_amount_for_sum(spark, tmp_path):
    """sum/avg maintenance adds exact integers; a double amount raises
    instead of silently truncating (min/max alone still accept it)."""
    ra, rb, dst = (str(tmp_path / x) for x in ("a", "b", "dst"))
    snapshot_commit(
        spark.createDataFrame([(1, 10, 5.5)], "id int, k int, amt double"),
        ra,
    )
    snapshot_commit(
        spark.createDataFrame([(10, "x")], "k int, g string"), rb
    )
    with pytest.raises(ValueError, match="integer cents"):
        snapshot_incremental_join_agg(
            spark, ra, rb, dst, on="k", group_col="g", amount_col="amt"
        )
    out = snapshot_incremental_join_agg(
        spark, ra, rb, str(tmp_path / "d2"), on="k", group_col="g",
        amount_col="amt", aggs=("count", "min", "max"),
    )
    assert out["refreshed"]
