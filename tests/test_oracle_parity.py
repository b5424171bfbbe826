"""The primary gate (SURVEY.md §5.2 item 1): every declared SQL-oracle
query must match DuckDB at the driver's correctness scale (sf0.01)."""

from __future__ import annotations

import pytest

from tropology_spark import ORACLES, QUERIES
from tests.conftest import SF_ORACLE
from tests.parity import compare


def all_sql_queries():
    return sorted(ORACLES.keys())


@pytest.mark.parametrize("name", all_sql_queries())
def test_oracle_parity(name, spark, duck_oracle):
    compare(name, spark, duck_oracle, QUERIES[name], ORACLES[name], SF_ORACLE)


def test_rows_only_queries_run(spark):
    """Queries declared rows-only must still execute and return >=0 rows
    with a stable schema."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_ORACLE)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"r_name", "revenue", "n_items"}
