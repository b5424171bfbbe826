"""Cross-engine deterministic aggregation helpers (SURVEY.md §7.4).

Floating-point SUM/AVG results depend on summation order, which differs
between Spark (partition-parallel) and DuckDB (vector-sequential) — and
even between two Spark runs with different ``shuffle.partitions``.
Rounding *after* the sum merely narrows the mismatch window; it cannot
close it.

Instead, every declared money/metric aggregate uses **fixed-point exact
summation**: each element is independently rounded to an integer number
of cents (scale=2) or micro-units (scale=6) — an order-independent,
IEEE-deterministic per-element step — then summed as exact integers,
then divided back.  The declared query semantics are therefore
"cent-exact accounting", identical across engines, partitionings, and
row orders by construction.

Each helper has a Spark side (Column) and an oracle side (SQL string
fragment) that are kept textually parallel so review can confirm they
compute the same function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _cents(col: Column, scale: int) -> Column:
    # Element-wise double→int rounding: deterministic for a given input
    # double in both engines (both round half away from zero for the
    # values in play; the product below is a single IEEE multiply).
    return F.round(col * F.lit(float(10**scale))).cast("long")


def exact_sum(col: Column, scale: int = 2, out_scale: int | None = None) -> Column:
    """Order-independent SUM of a double column at ``scale`` decimals."""
    out_scale = scale if out_scale is None else out_scale
    return F.round(F.sum(_cents(col, scale)) / F.lit(float(10**scale)), out_scale)


def exact_avg(col: Column, scale: int = 2, out_scale: int = 6) -> Column:
    """Order-independent AVG: exact integer sum / exact count."""
    return F.round(
        F.sum(_cents(col, scale)) / F.lit(float(10**scale)) / F.count(F.lit(1)),
        out_scale,
    )


def sql_exact_sum(expr: str, scale: int = 2, out_scale: int | None = None) -> str:
    """DuckDB twin of :func:`exact_sum` (textually parallel)."""
    out_scale = scale if out_scale is None else out_scale
    mult = float(10**scale)
    return (
        f"round(CAST(sum(CAST(round(({expr}) * {mult}) AS BIGINT)) AS DOUBLE)"
        f" / {mult}, {out_scale})"
    )


def sql_exact_avg(expr: str, scale: int = 2, out_scale: int = 6) -> str:
    """DuckDB twin of :func:`exact_avg`."""
    mult = float(10**scale)
    return (
        f"round(CAST(sum(CAST(round(({expr}) * {mult}) AS BIGINT)) AS DOUBLE)"
        f" / {mult} / count(*), {out_scale})"
    )


#: Output timestamp convention (SURVEY.md §7.6): every declared query
#: that returns a timestamp formats it to this second-granularity
#: string in BOTH engines, sidestepping ns/µs repr differences.
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
DATE_FMT_SPARK = "yyyy-MM-dd"
DATE_FMT_DUCK = "%Y-%m-%d"


def ts_str(col: Column) -> Column:
    return F.date_format(col, TS_FMT_SPARK)


def date_str(col: Column) -> Column:
    return F.date_format(col, DATE_FMT_SPARK)


def sql_ts_str(expr: str) -> str:
    return f"strftime({expr}, '{TS_FMT_DUCK}')"


def sql_date_str(expr: str) -> str:
    return f"strftime({expr}, '{DATE_FMT_DUCK}')"
