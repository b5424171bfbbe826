"""Shared fixtures: one SparkSession and one DuckDB connection per run."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_UNIT = os.environ.get("TROPOLOGY_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("TROPOLOGY_ORACLE_SF", "/root/testdata/sf0.01")

from tropology_spark.sources.tables import TABLES  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from tropology_spark.session import get_spark

    # Keep unit-test sessions modest; bench uses the full core count.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("tropology-tests")
    yield spark
    spark.stop()


def make_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck_oracle():
    con = make_duckdb(SF_ORACLE)
    yield con
    con.close()
