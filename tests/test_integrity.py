"""Unit tests: integrity audit positive paths (the fixture is clean, so the
oracle-checked query only ever sees n_bad=0 — these plant real violations)."""

from __future__ import annotations

from airflow_postgres_csv_spark.operators.integrity import (
    audit_checks,
    dup_pk_count,
    fk_orphans,
    null_key_count,
)


def test_fk_orphans_counts_only_nonnull_misses(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "k bigint"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    row = fk_orphans(child, "k", parent, "pk").collect()[0]
    # 99 is an orphan; NULL is not (FK semantics); total counts all rows
    assert (row.n_bad, row.n_total) == (1, 4)


def test_dup_pk_and_null_key(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (None, "d")], "k bigint, v string"
    )
    dup = dup_pk_count(df, ["k"]).collect()[0]
    assert (dup.n_bad, dup.n_total) == (1, 4)  # second k=1 row is the dup
    nul = null_key_count(df, "k").collect()[0]
    assert (nul.n_bad, nul.n_total) == (1, 4)


def test_audit_checks_union_and_ok_flag(spark):
    child = spark.createDataFrame([(7,)], "k bigint")
    parent = spark.createDataFrame([(1,)], "pk bigint")
    out = {
        r.check_name: r
        for r in audit_checks(
            {
                "bad_fk": fk_orphans(child, "k", parent, "pk"),
                "good_null": null_key_count(child, "k"),
            }
        ).collect()
    }
    assert out["bad_fk"].ok == 0 and out["bad_fk"].n_bad == 1
    assert out["good_null"].ok == 1 and out["good_null"].n_bad == 0


def test_table_diff_statuses_and_null_safety(spark):
    from airflow_postgres_csv_spark.operators.merge import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, "d", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10),        # unchanged -> not emitted
         (2, "b", None),      # NULL == NULL -> unchanged
         (3, "c", None),      # 30 -> NULL is a change
         (5, "e", 50)],       # added; 4 removed
        "k long, s string, v long",
    )
    got = {(r.k, r.diff_status) for r in table_diff(old, new, keys=["k"]).collect()}
    assert got == {(3, "changed"), (4, "removed"), (5, "added")}

    import pytest

    with pytest.raises(ValueError, match="schemas differ"):
        table_diff(old, new.select("k", "v", "s"), keys=["k"])


def _diff_reference(old_rows, new_rows):
    """Brute-force reference: dict-compare by key with NULL==NULL."""
    o = {r[0]: r[1:] for r in old_rows}
    n = {r[0]: r[1:] for r in new_rows}
    out = set()
    for k in o.keys() | n.keys():
        if k not in n:
            out.add((k, "removed"))
        elif k not in o:
            out.add((k, "added"))
        elif o[k] != n[k]:
            out.add((k, "changed"))
    return out


def test_table_diff_matches_reference_property(spark):
    from hypothesis import HealthCheck, given, settings, strategies as st

    from airflow_postgres_csv_spark.operators.merge import table_diff

    cell = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
    row = st.tuples(st.integers(min_value=0, max_value=12), cell, cell)

    @given(
        old=st.lists(row, max_size=12, unique_by=lambda r: r[0]),
        new=st.lists(row, max_size=12, unique_by=lambda r: r[0]),
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(old, new):
        schema = "k long, a long, b long"
        odf = spark.createDataFrame(old, schema) if old else spark.createDataFrame([], schema)
        ndf = spark.createDataFrame(new, schema) if new else spark.createDataFrame([], schema)
        got = {
            (r.k, r.diff_status)
            for r in table_diff(odf, ndf, keys=["k"]).collect()
        }
        assert got == _diff_reference(old, new)

    check()


def test_profile_columns_nulls_extremes_and_approx(spark):
    from airflow_postgres_csv_spark.operators.profiling import profile_columns
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    prof = {r.column: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert prof["k"].n == 100 and prof["k"].n_nulls == 10
    assert prof["k"].n_distinct == 90
    # native-type extremes, not lexicographic: min 1 (0 is null), max 99
    assert prof["k"].min_s == "1" and prof["k"].max_s == "99"
    # string column: lexicographic is correct for strings
    assert prof["s"].min_s == "s0" and prof["s"].max_s == "s99"
    # approx path returns the same shape with ndv within HLL tolerance
    approx = {r.column: r for r in profile_columns(df, ["k"], exact=False).collect()}
    assert abs(approx["k"].n_distinct - 90) <= 9
