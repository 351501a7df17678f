"""Model-based property test for the CATALOG subsystem: random
interleavings of multi-table transactions, WAP (passing and failing),
and catalog-branch fork/stage/publish cycles against a plain-Python
model of the catalog-visible state.

Invariants, checked by hypothesis over generated histories:

1. After every operation, ``catalog_read`` of every table equals the
   model — failed audits and refused publishes change NOTHING.
2. Catalog time travel: every catalog version still reads every table
   exactly as the transaction that published it left the world
   (mutual consistency is per catalog version, forever).
3. Branch publishes are all-or-nothing across tables, and a branch
   whose touched table was moved on main conflicts instead of
   interleaving.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators.branches import AuditError
from airflow_postgres_csv_spark.operators.catalog_txn import (
    CatalogConflictError,
    catalog_branch,
    catalog_branch_write,
    catalog_drop_branch,
    catalog_publish_branch,
    catalog_read,
    catalog_txn,
    catalog_versions,
)

TABLES = ("a", "b")

# catalog-view definitions over table "a": (stored SQL, model evaluator)
_VIEW_DEFS = {
    0: (
        "SELECT CAST(COUNT(*) AS BIGINT) AS x FROM ta",
        lambda rows: len(rows),
    ),
    1: (
        "SELECT CAST(SUM(id) AS BIGINT) AS x FROM ta",
        lambda rows: sum(i for i, _ in rows),
    ),
    2: (
        "SELECT CAST(MAX(stamp) AS BIGINT) AS x FROM ta",
        lambda rows: max(s for _, s in rows),
    ),
}

_op = st.one_of(
    # multi-table txn: append rows to a subset of tables, one atomic flip
    st.tuples(
        st.just("txn"), st.integers(0, 9), st.integers(1, 3),
        st.integers(1, 3),  # bitmask over TABLES (never 0)
    ),
    # WAP that passes / fails its aggregate audit
    st.tuples(st.just("wap_ok"), st.integers(0, 9), st.integers(1, 3)),
    st.tuples(st.just("wap_fail"), st.integers(0, 9), st.integers(1, 3)),
    # catalog branch: fork, stage on a subset, publish — optionally with
    # a concurrent main txn in between touching a DISJOINT table
    # (snapshot isolation) or the SAME table (conflict)
    st.tuples(
        st.just("branch"), st.integers(0, 9), st.integers(1, 3),
        st.sampled_from(["clean", "disjoint", "conflict"]),
    ),
    # stored view over table a: create-or-replace with one of the defs,
    # or drop it (no-op when absent)
    st.tuples(st.just("view_set"), st.integers(0, 2)),
    st.tuples(st.just("view_drop"), st.just(0)),
    # materialized view over table a: create (no-op when present),
    # refresh (freezes eval-at-refresh-time), drop (no-op when absent)
    st.tuples(st.just("mview_set"), st.integers(0, 2)),
    st.tuples(st.just("mview_refresh"), st.just(0)),
    st.tuples(st.just("mview_drop"), st.just(0)),
    # INCREMENTAL mview over table a (general shape: group_cols +
    # count/sum/avg/min/max), and an out-of-band retraction on a that the
    # next pinned refresh must fold in (min/max displacement included)
    st.tuples(st.just("imv_set"), st.just(0)),
    st.tuples(st.just("imv_refresh"), st.just(0)),
    st.tuples(st.just("imv_drop"), st.just(0)),
    st.tuples(st.just("adel"), st.integers(0, 2)),
)


def _imv_eval(rows):
    """Model of the incremental mview surface: GROUP BY stamp over live
    (id, stamp) rows with n/total/avg/mn/mx on id — what catalog_read
    must serve after a refresh froze this state."""
    groups: dict = {}
    for i, s in rows:
        groups.setdefault(s, []).append(i)
    return sorted(
        (s, len(v), sum(v), sum(v) / len(v), min(v), max(v))
        for s, v in groups.items()
    )


def _read_all(spark, cat, catalog_version=None):
    out = {}
    for t in TABLES:
        out[t] = sorted(
            tuple(r)
            for r in catalog_read(
                spark, cat, t, catalog_version=catalog_version
            ).collect()
        )
    return out


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=2, max_size=5))
@pytest.mark.slow
def test_random_catalog_histories_match_model(spark, tmp_path_factory, ops):
    base = tmp_path_factory.mktemp("catmodel")
    cat = str(base / "cat")
    roots = {t: str(base / t) for t in TABLES}

    def df(rows):
        return spark.createDataFrame(rows, "id long, stamp long").coalesce(1)

    # seed both tables in one transaction
    model = {t: [(i, 0) for i in range(5)] for t in TABLES}
    catalog_txn(
        cat,
        [{"name": t, "root": roots[t], "df": df(model[t])} for t in TABLES],
    )
    hist = {catalog_versions(cat)[-1]: {t: sorted(model[t]) for t in TABLES}}
    vmodel: int | None = None  # current view def id (None = no view)
    vhist = {catalog_versions(cat)[-1]: None}  # version -> expected view x
    # materialized view model: (def id, frozen value at last refresh)
    mv_def: int | None = None
    mv_frozen: int | None = None
    mi = 0  # distinct materialized roots per mview generation
    bi = 0  # unique branch names across retries of the same history
    # incremental mview model: present flag + frozen rollup at refresh
    imv_on = False
    imv_frozen: list | None = None
    ii = 0  # distinct incremental materialized roots per generation
    for opi, op in enumerate(ops, start=1):
        kind = op[0]
        if kind == "view_set":
            from airflow_postgres_csv_spark.operators.catalog_txn import (
                catalog_ddl,
            )

            _, di = op
            sql, _ = _VIEW_DEFS[di]
            catalog_ddl(
                cat,
                [{
                    "op": "create_view" if vmodel is None else "replace_view",
                    "name": "v", "sql": sql, "tables": {"ta": "a"},
                }],
            )
            vmodel = di
        elif kind == "view_drop":
            if vmodel is not None:
                from airflow_postgres_csv_spark.operators.catalog_txn import (
                    catalog_ddl,
                )

                catalog_ddl(cat, [{"op": "drop_view", "name": "v"}])
                vmodel = None
        elif kind == "mview_set":
            if mv_def is None:
                from airflow_postgres_csv_spark.operators.catalog_txn import (
                    catalog_ddl,
                )

                _, di = op
                mi += 1
                catalog_ddl(
                    cat,
                    [{
                        "op": "create_mview", "name": "mv",
                        "sql": _VIEW_DEFS[di][0], "tables": {"ta": "a"},
                        "root": str(base / f"mvroot{mi}"),
                    }],
                )
                mv_def, mv_frozen = di, None
        elif kind == "mview_refresh":
            if mv_def is not None:
                from airflow_postgres_csv_spark.operators.catalog_txn import (
                    catalog_refresh_mview,
                )

                catalog_refresh_mview(spark, cat, "mv")
                mv_frozen = _VIEW_DEFS[mv_def][1](model["a"])
        elif kind == "mview_drop":
            if mv_def is not None:
                from airflow_postgres_csv_spark.operators.catalog_txn import (
                    catalog_ddl,
                )

                catalog_ddl(cat, [{"op": "drop_mview", "name": "mv"}])
                mv_def = mv_frozen = None
        elif kind == "imv_set":
            if not imv_on:
                from airflow_postgres_csv_spark.operators.catalog_txn import (
                    catalog_ddl,
                )

                ii += 1
                catalog_ddl(
                    cat,
                    [{
                        "op": "create_mview", "name": "imv",
                        "tables": {"ta": "a"},
                        "root": str(base / f"imvroot{ii}"),
                        "incremental": {
                            "group_cols": ["stamp"], "amount_col": "id",
                            "aggs": ["count", "sum", "avg", "min", "max"],
                        },
                    }],
                )
                imv_on, imv_frozen = True, None
        elif kind == "imv_refresh":
            if imv_on:
                from airflow_postgres_csv_spark.operators.catalog_txn import (
                    catalog_refresh_mview,
                )

                catalog_refresh_mview(spark, cat, "imv")
                imv_frozen = _imv_eval(model["a"])
        elif kind == "imv_drop":
            if imv_on:
                from airflow_postgres_csv_spark.operators.catalog_txn import (
                    catalog_ddl,
                )

                catalog_ddl(cat, [{"op": "drop_mview", "name": "imv"}])
                imv_on, imv_frozen = False, None
        elif kind == "adel":
            # out-of-band retraction on a + catalog pin: live state and
            # every view/mview model shrink together
            _, k = op
            remaining = [r for r in model["a"] if r[0] % 3 != k]
            # keep a non-empty (the view defs aggregate over it) and only
            # fire when the retraction actually removes rows
            if remaining and len(remaining) < len(model["a"]):
                from airflow_postgres_csv_spark.operators.catalog_txn import (
                    catalog_pin_tables,
                )
                from airflow_postgres_csv_spark.operators.snapshots import (
                    snapshot_delete_mor,
                    snapshot_versions,
                )

                snapshot_delete_mor(
                    spark, roots["a"], f"id % 3 = {k}", key_col="id"
                )
                catalog_pin_tables(
                    cat, {"a": (roots["a"], snapshot_versions(roots["a"])[-1])}
                )
                model["a"] = remaining
        if kind == "txn":
            _, lo, n, mask = op
            writes = []
            for j, t in enumerate(TABLES):
                if mask & (1 << j):
                    rows = [(i, opi) for i in range(lo, lo + n)]
                    writes.append({"name": t, "root": roots[t], "df": df(rows)})
                    model[t] = model[t] + rows
            catalog_txn(cat, writes)
        elif kind == "wap_ok":
            _, lo, n = op
            from airflow_postgres_csv_spark.operators.catalog_txn import (
                catalog_write_audit_publish,
            )

            rows = [(i, opi) for i in range(lo, lo + n)]
            catalog_write_audit_publish(
                spark, cat,
                [{"name": "a", "root": roots["a"], "df": df(rows)}],
                audits={"a": {"nonempty": "count(*) > 0"}},
            )
            model["a"] = model["a"] + rows
        elif kind == "wap_fail":
            _, lo, n = op
            from airflow_postgres_csv_spark.operators.catalog_txn import (
                catalog_write_audit_publish,
            )

            rows = [(i, opi) for i in range(lo, lo + n)]
            try:
                catalog_write_audit_publish(
                    spark, cat,
                    [{"name": "a", "root": roots["a"], "df": df(rows)}],
                    audits={"a": {"impossible": "count(*) < 0"}},
                )
                raise AssertionError("audit must fail")
            except AuditError:
                pass  # catalog AND model unchanged
        elif kind == "branch":
            _, lo, n, race = op
            bi += 1
            bname = f"exp{bi}"
            catalog_branch(cat, bname)
            rows = [(i, opi) for i in range(lo, lo + n)]
            catalog_branch_write(
                spark, cat, bname, [{"name": "a", "df": df(rows)}]
            )
            if race == "disjoint":
                # main moves b while the branch is in flight: publish
                # succeeds, both effects land (snapshot isolation)
                brows = [(i, 1000 + opi) for i in range(lo, lo + n)]
                catalog_txn(
                    cat, [{"name": "b", "root": roots["b"], "df": df(brows)}]
                )
                model["b"] = model["b"] + brows
                catalog_publish_branch(cat, bname)
                model["a"] = model["a"] + rows
            elif race == "conflict":
                # main moves a (touched by the branch): publish conflicts,
                # nothing from the branch lands; drop it
                arows = [(i, 2000 + opi) for i in range(lo, lo + n)]
                catalog_txn(
                    cat, [{"name": "a", "root": roots["a"], "df": df(arows)}]
                )
                model["a"] = model["a"] + arows
                try:
                    catalog_publish_branch(cat, bname)
                    raise AssertionError("publish must conflict")
                except CatalogConflictError:
                    catalog_drop_branch(cat, bname)
            else:
                catalog_publish_branch(cat, bname)
                model["a"] = model["a"] + rows
        got = _read_all(spark, cat)
        want = {t: sorted(model[t]) for t in TABLES}
        assert got == want, f"catalog state diverged after op {opi} {op}"
        if vmodel is not None:
            _, ev = _VIEW_DEFS[vmodel]
            vx = catalog_read(spark, cat, "v").collect()[0]["x"]
            assert vx == ev(model["a"]), f"view diverged after op {opi} {op}"
        if mv_def is not None and mv_frozen is not None:
            # materialized reads serve the FROZEN refresh-time value,
            # whatever the sources did since
            mx = catalog_read(spark, cat, "mv").collect()[0]["x"]
            assert mx == mv_frozen, f"mview diverged after op {opi} {op}"
        if imv_on and imv_frozen is not None:
            got_imv = sorted(
                tuple(r)
                for r in catalog_read(spark, cat, "imv").collect()
            )
            assert got_imv == imv_frozen, (
                f"incremental mview diverged after op {opi} {op}"
            )
        hist[catalog_versions(cat)[-1]] = want
        vhist[catalog_versions(cat)[-1]] = (
            None if vmodel is None else (vmodel, _VIEW_DEFS[vmodel][1](model["a"]))
        )
    # catalog time travel: every published version replays its exact world
    # — tables AND the view definition + data of its era
    for v, want in hist.items():
        assert _read_all(spark, cat, catalog_version=v) == want, (
            f"catalog time travel to v{v} diverged"
        )
        vexp = vhist.get(v)
        if vexp is not None:
            assert (
                catalog_read(spark, cat, "v", catalog_version=v)
                .collect()[0]["x"]
                == vexp[1]
            ), f"view time travel to v{v} diverged"
