"""Unit tests for the JDBC option surface — generated-SQL/option assertions
in the style of the reference's fully-mocked tests
(reference tests/test_operators.py:12-31, 131-180): no live database.
"""

from __future__ import annotations

import pytest

from airflow_postgres_csv_spark.operators import jdbc


def test_quote_identifier_plain():
    assert jdbc.quote_identifier("my_table") == '"my_table"'


def test_quote_identifier_schema_qualified():
    """Reference test_operators.py:131-145."""
    assert jdbc.quote_identifier("public.users") == '"public"."users"'


def test_quote_identifier_embedded_quote():
    assert jdbc.quote_identifier('we"ird') == '"we""ird"'


def test_read_options_query_pushdown():
    opts = jdbc.read_options("jdbc:postgresql://h/db", sql="SELECT * FROM t;")
    assert opts["query"] == "SELECT * FROM t"  # semicolon stripped
    assert opts["queryTimeout"] == str(60 * 60)
    assert "dbtable" not in opts


def test_read_options_table_quoted():
    opts = jdbc.read_options("u", table="public.users", timeout_minutes=5)
    assert opts["dbtable"] == '"public"."users"'
    assert opts["queryTimeout"] == "300"


def test_read_options_exactly_one_source():
    with pytest.raises(ValueError):
        jdbc.read_options("u")
    with pytest.raises(ValueError):
        jdbc.read_options("u", sql="SELECT 1", table="t")


def test_read_options_partitioned():
    opts = jdbc.read_options(
        "u", table="t", partition_column="id",
        lower_bound=0, upper_bound=1000, num_partitions=8,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "8"
    with pytest.raises(ValueError, match="bounds"):
        jdbc.read_options("u", table="t", partition_column="id")


def test_parameter_binding_literals():
    """Reference README.md:33-34 %(name)s style; quoting like mogrify."""
    sql = jdbc._bind_parameters(
        "SELECT * FROM t WHERE active = %(active)s AND name = %(nm)s AND n = %(n)s",
        {"active": True, "nm": "O'Brien", "n": 3},
    )
    assert sql == "SELECT * FROM t WHERE active = TRUE AND name = 'O''Brien' AND n = 3"


def test_parameter_binding_preserves_literal_percent():
    """LIKE '%x%', modulo and format masks must survive binding untouched —
    only %(name)s tokens are substituted (no %%-doubling convention)."""
    sql = jdbc._bind_parameters(
        "SELECT * FROM t WHERE name LIKE '%abc%' AND id %% 2 = 0 AND k = %(k)s",
        {"k": 7},
    )
    assert sql == "SELECT * FROM t WHERE name LIKE '%abc%' AND id %% 2 = 0 AND k = 7"
    # no parameters → SQL passes through verbatim
    assert jdbc._bind_parameters("SELECT '100%'", None) == "SELECT '100%'"


def test_parameter_binding_rejects_nonfinite_and_missing():
    with pytest.raises(ValueError, match="non-finite"):
        jdbc._bind_parameters("SELECT %(x)s", {"x": float("inf")})
    with pytest.raises(KeyError, match="not supplied"):
        jdbc._bind_parameters("SELECT %(x)s", {"y": 1})


def test_write_options_truncate_mode():
    """Reference test_operators.py:165-180 — TRUNCATE before load."""
    mode, opts = jdbc.write_options("u", "public.users", truncate=True)
    assert mode == "overwrite"
    assert opts["truncate"] == "true"
    assert opts["dbtable"] == '"public"."users"'


def test_write_options_append_default():
    mode, opts = jdbc.write_options("u", "t")
    assert mode == "append" and opts["truncate"] == "false"


def test_atomic_load_plan_swap_sql():
    """Single-transaction truncate+load parity (operators.py:172-184)."""
    plan = jdbc.atomic_load_plan("public.users")
    assert plan.staging_table == "public.users_spark_staging"
    joined = ";".join(plan.swap_sql)
    assert joined.startswith("BEGIN")
    assert 'TRUNCATE "public"."users"' in joined
    assert joined.endswith("COMMIT")
