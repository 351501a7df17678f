"""Driver-contract smoke tests: entry() runs, registry is consistent."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_registry_shapes():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 16
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_all_queries_run_smoke(spark, sf_dir):
    """Every registered query must at least execute at sf0.001."""
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
