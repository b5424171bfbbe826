"""Replicates the driver's Spark-vs-DuckDB comparison (SURVEY.md §5.2).

Canonicalization is deliberately STRICTER than a hash: both result sets
are turned into multisets of tuples (columns sorted by name, values
canonicalized) and compared directly, so a failure shows the first
differing rows instead of a bare hash mismatch.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
from pyspark.sql import DataFrame, SparkSession


def canon_value(v: Any) -> Any:
    """Engine-neutral value form."""
    if v is None:
        return None
    # numpy scalars → python
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly; both engines hand back the
        # same IEEE double for our deterministic queries.
        return repr(v)
    if isinstance(v, int):
        return v
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def spark_result(df: DataFrame) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con: duckdb.DuckDBPyConnection, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def compare(
    name: str,
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    query_fn,
    oracle: str,
    sf_dir: str,
) -> None:
    """Assert Spark query and DuckDB oracle agree; raise with detail."""
    s_cols, s_rows = spark_result(query_fn(spark, sf_dir))
    d_cols, d_rows = duck_result(con, oracle)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(cs, cd)) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (row, spark, duck): {diffs}"
        )
