"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_postgres_csv_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # the suite runs on sf0.001/sf0.01 fixtures where fixed per-task
    # scheduling overhead dominates 32-partition shuffles; 8 state/shuffle
    # partitions measurably cut wall-clock (the engine's production
    # default in session.py is untouched — this scopes the TEST session)
    s = get_spark("pytest", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture()
def tmp_out(tmp_path):
    return str(tmp_path)
