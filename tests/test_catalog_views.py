"""Catalog-stored VIEWS (operators/catalog_txn.py): SQL text versioned
with the catalog (Iceberg view-spec shape), resolved late over the
READING catalog version's table pins — so time travel replays the view
definition and the data of its era together — plus the dependency and
namespace-collision guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.catalog_txn import (
    catalog_branch,
    catalog_branch_write,
    catalog_ddl,
    catalog_drop_branch,
    catalog_pin_tables,
    catalog_read,
    catalog_txn,
    catalog_views,
)
from airflow_postgres_csv_spark.operators.snapshots import snapshot_commit


def _seed(spark, tmp_path):
    """Catalog with two tables: orders(id, amount), users(id, seg)."""
    cat = str(tmp_path / "cat")
    ro, ru = str(tmp_path / "orders"), str(tmp_path / "users")
    orders = spark.range(0, 100).select(
        "id", (F.col("id") % 7).cast("double").alias("amount")
    )
    users = spark.range(0, 100).select(
        "id", (F.col("id") % 3).cast("string").alias("seg")
    )
    catalog_txn(
        cat,
        [
            {"name": "sales.orders", "root": ro, "df": orders},
            {"name": "sales.users", "root": ru, "df": users},
        ],
    )
    return cat, ro, ru


_VIEW_SQL = """
    SELECT u.seg AS seg, CAST(SUM(o.amount) AS DOUBLE) AS total
    FROM o JOIN u ON o.id = u.id
    GROUP BY u.seg
"""


def _create_view(cat):
    catalog_ddl(
        cat,
        [
            {
                "op": "create_view",
                "name": "sales.by_seg",
                "sql": _VIEW_SQL,
                "tables": {"o": "sales.orders", "u": "sales.users"},
            }
        ],
    )


def test_view_create_read_list(spark, tmp_path):
    cat, ro, ru = _seed(spark, tmp_path)
    _create_view(cat)
    got = {
        r["seg"]: r["total"]
        for r in catalog_read(spark, cat, "sales.by_seg").collect()
    }
    want = {
        r["seg"]: r["total"]
        for r in spark.sql(
            "SELECT CAST(id % 3 AS STRING) seg, "
            "CAST(SUM(CAST(id % 7 AS DOUBLE)) AS DOUBLE) total "
            "FROM range(100) GROUP BY 1"
        ).collect()
    }
    assert got == want
    views = catalog_views(cat)
    assert set(views) == {"sales.by_seg"}
    assert views["sales.by_seg"]["tables"] == {
        "o": "sales.orders",
        "u": "sales.users",
    }


def test_view_time_travel_replays_old_definition_and_pins(spark, tmp_path):
    cat, ro, ru = _seed(spark, tmp_path)
    _create_view(cat)
    v_created = 2  # txn=1, create_view=2
    before = catalog_read(spark, cat, "sales.by_seg").collect()
    # new data + a REPLACEd definition (count instead of sum)
    snapshot_commit(
        spark.range(100, 200).select(
            "id", F.lit(100.0).alias("amount")
        ),
        ro,
    )
    catalog_pin_tables(cat, {"sales.orders": (ro, 2)})
    catalog_ddl(
        cat,
        [
            {
                "op": "replace_view",
                "name": "sales.by_seg",
                "sql": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o",
                "tables": {"o": "sales.orders"},
            }
        ],
    )
    # head: new definition over new pins
    assert catalog_read(spark, cat, "sales.by_seg").collect()[0]["n"] == 200
    # as-of the creation version: old SQL over the old orders pin
    old = catalog_read(
        spark, cat, "sales.by_seg", catalog_version=v_created
    ).collect()
    assert sorted(map(tuple, old)) == sorted(map(tuple, before))


def test_view_rides_every_later_catalog_version(spark, tmp_path):
    cat, ro, ru = _seed(spark, tmp_path)
    _create_view(cat)
    # unrelated pin-only publishes and DDL carry the view forward
    snapshot_commit(spark.range(0, 5).select("id", F.lit(1.0).alias("amount")),
                    str(tmp_path / "other"))
    catalog_pin_tables(cat, {"sales.other": (str(tmp_path / "other"), 1)})
    catalog_ddl(cat, [{"op": "rename", "name": "sales.other",
                       "to": "sales.other2"}])
    assert "sales.by_seg" in catalog_views(cat)
    assert catalog_read(spark, cat, "sales.by_seg").count() == 3


def test_view_dependency_and_collision_guards(spark, tmp_path):
    cat, ro, ru = _seed(spark, tmp_path)
    _create_view(cat)
    with pytest.raises(ValueError, match="views .* reference it"):
        catalog_ddl(cat, [{"op": "drop", "name": "sales.orders"}])
    with pytest.raises(ValueError, match="reference it by name"):
        catalog_ddl(
            cat,
            [{"op": "rename", "name": "sales.orders", "to": "sales.o2"}],
        )
    with pytest.raises(ValueError, match="is a view"):
        catalog_ddl(cat, [{"op": "drop", "name": "sales.by_seg"}])
    with pytest.raises(ValueError, match="already exists"):
        catalog_ddl(
            cat,
            [
                {
                    "op": "create_view",
                    "name": "sales.orders",
                    "sql": "SELECT 1 AS one",
                    "tables": {"o": "sales.users"},
                }
            ],
        )
    with pytest.raises(ValueError, match="view-on-view"):
        catalog_ddl(
            cat,
            [
                {
                    "op": "create_view",
                    "name": "sales.vv",
                    "sql": "SELECT * FROM v",
                    "tables": {"v": "sales.by_seg"},
                }
            ],
        )
    with pytest.raises(ValueError, match="a table pin cannot replace"):
        catalog_pin_tables(cat, {"sales.by_seg": (ro, 1)})
    # renaming the VIEW itself is fine (aliases are internal)
    catalog_ddl(
        cat, [{"op": "rename", "name": "sales.by_seg", "to": "sales.v2"}]
    )
    assert set(catalog_views(cat)) == {"sales.v2"}
    # after dropping the view, the table ops unblock
    catalog_ddl(cat, [{"op": "drop_view", "name": "sales.v2"}])
    catalog_ddl(
        cat, [{"op": "rename", "name": "sales.orders", "to": "sales.o2"}]
    )


def test_view_rides_catalog_branches(spark, tmp_path):
    cat, ro, ru = _seed(spark, tmp_path)
    _create_view(cat)
    broot = catalog_branch(cat, "exp")
    # the branch sees the view over ITS pins; writing to the view refuses
    assert "sales.by_seg" in catalog_views(broot)
    assert catalog_read(spark, broot, "sales.by_seg").count() == 3
    with pytest.raises(ValueError, match="is a view"):
        catalog_branch_write(
            spark,
            cat,
            "exp",
            [{"name": "sales.by_seg", "df": spark.range(1)}],
        )
    catalog_drop_branch(cat, "exp")


def test_view_validation_errors(spark, tmp_path):
    cat, ro, ru = _seed(spark, tmp_path)
    with pytest.raises(ValueError, match="non-empty SQL"):
        catalog_ddl(
            cat,
            [{"op": "create_view", "name": "v", "sql": "  ",
              "tables": {"o": "sales.orders"}}],
        )
    with pytest.raises(KeyError, match="not in"):
        catalog_ddl(
            cat,
            [{"op": "create_view", "name": "v", "sql": "SELECT 1",
              "tables": {"o": "sales.nope"}}],
        )
    with pytest.raises(ValueError, match="plain"):
        catalog_ddl(
            cat,
            [{"op": "create_view", "name": "v", "sql": "SELECT 1",
              "tables": {"bad-alias": "sales.orders"}}],
        )
    with pytest.raises(KeyError, match="replace_view"):
        catalog_ddl(
            cat,
            [{"op": "replace_view", "name": "v", "sql": "SELECT 1",
              "tables": {"o": "sales.orders"}}],
        )


def test_branch_view_ddl_publishes_atomically(spark, tmp_path):
    """View DDL staged on a catalog branch lands on main in the SAME flip
    as the branch's table pins — and a view-only branch publishes too."""
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        CatalogConflictError,
        catalog_publish_branch,
        catalog_versions,
    )

    cat, ro, ru = _seed(spark, tmp_path)
    _create_view(cat)

    # branch: replace the view AND write to orders; one publish, one flip
    broot = catalog_branch(cat, "exp")
    catalog_ddl(
        broot,
        [{
            "op": "replace_view", "name": "sales.by_seg",
            "sql": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o",
            "tables": {"o": "sales.orders"},
        }],
    )
    catalog_branch_write(
        spark, cat, "exp",
        [{"name": "sales.orders",
          "df": spark.range(100, 150).select(
              "id", F.lit(1.0).alias("amount"))}],
    )
    pre_v = catalog_versions(cat)[-1]
    catalog_publish_branch(cat, "exp")
    # main: new rows AND the new definition together
    assert catalog_read(spark, cat, "sales.by_seg").collect()[0]["n"] == 150
    # pre-publish main version still reads the OLD definition
    old = catalog_read(
        spark, cat, "sales.by_seg", catalog_version=pre_v
    )
    assert set(old.columns) == {"seg", "total"}

    # view-only branch (no table writes): create + drop still publish
    broot2 = catalog_branch(cat, "vonly")
    catalog_ddl(
        broot2,
        [{
            "op": "create_view", "name": "sales.n_users",
            "sql": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u",
            "tables": {"u": "sales.users"},
        }],
    )
    catalog_publish_branch(cat, "vonly")
    assert "sales.n_users" in catalog_views(cat)
    assert catalog_read(spark, cat, "sales.n_users").collect()[0]["n"] == 100

    # conflict: main replaces a view after the fork; branch touched it too
    broot3 = catalog_branch(cat, "race")
    catalog_ddl(
        broot3,
        [{
            "op": "replace_view", "name": "sales.n_users",
            "sql": "SELECT CAST(SUM(id) AS BIGINT) AS n FROM u",
            "tables": {"u": "sales.users"},
        }],
    )
    catalog_ddl(
        cat,
        [{
            "op": "replace_view", "name": "sales.n_users",
            "sql": "SELECT CAST(MAX(id) AS BIGINT) AS n FROM u",
            "tables": {"u": "sales.users"},
        }],
    )
    with pytest.raises(CatalogConflictError, match="view .* moved on main"):
        catalog_publish_branch(cat, "race")
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_drop_branch as _drop,
    )

    _drop(cat, "race")
    # main keeps ITS definition (MAX)
    assert catalog_read(spark, cat, "sales.n_users").collect()[0]["n"] == 99


def test_view_sql_register(spark, tmp_path):
    """A catalog VIEW registers for raw spark.sql text as its resolved
    DataFrame over the addressed catalog version's pins."""
    from airflow_postgres_csv_spark.sources.snapshot_batch import (
        snapshot_sql_register,
    )

    cat, ro, ru = _seed(spark, tmp_path)
    _create_view(cat)
    snapshot_sql_register(spark, "seg_rollup", catalog=cat,
                          table="sales.by_seg")
    got = spark.sql(
        "SELECT seg, total FROM seg_rollup ORDER BY seg"
    ).collect()
    assert len(got) == 3 and got[0]["seg"] == "0"
    # and a MATERIALIZED view registers as its materialized table
    from airflow_postgres_csv_spark.operators.catalog_txn import (
        catalog_ddl,
        catalog_refresh_mview,
    )

    catalog_ddl(
        cat,
        [{
            "op": "create_mview", "name": "sales.mv",
            "sql": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o",
            "tables": {"o": "sales.orders"},
            "root": str(tmp_path / "mvr"),
        }],
    )
    catalog_refresh_mview(spark, cat, "sales.mv")
    snapshot_sql_register(spark, "mv_n", catalog=cat, table="sales.mv")
    assert spark.sql("SELECT n FROM mv_n").collect()[0]["n"] == 100
