"""Scale-safe global ordering (SURVEY.md §7.7, SCALE.md watch-item 1).

``Window.orderBy(...)`` with no partition spec funnels the whole frame
through ONE task — correct at fixture scale, a guaranteed straggler at
100 TB (the ``WindowExec: No Partition Defined`` warning).  These
helpers compute the SAME total-order positions with the classic
two-pass range-partitioned prefix-sum:

1. ``repartitionByRange`` the frame on the order keys, so partition
   ``i`` holds a contiguous key range and partitions are balanced by
   the range sampler (AQE-independent, data-size-proportional
   parallelism).
2. Materialize once (partition ids baked in — DOUBLE-REFERENCE RULE:
   the frame feeds both the counts pass and the rank pass).
3. Per-partition row counts → cumulative offsets.  This table has at
   most ``num_partitions x n_groups`` rows — bounded by CONFIG, not by
   data — so its prefix-sum window is trivially cheap at any scale.
4. Broadcast-join the offsets back; the final position is
   ``offset + row_number() over (partition-LOCAL window)``.

Because every caller orders by a key set with a unique tie-break
(repo discipline), the total order is unique and the result is
bit-identical to the single-partition window at every
``shuffle.partitions`` setting — pinned by the partitioning-invariance
probe and by tests/test_units.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import iter_materialize

_PID = "__go_pid"
_CNT = "__go_cnt"
_OFF = "__go_off"
_TOT = "__go_tot"


def _cols(cols: Sequence) -> list:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def global_row_number(
    df: DataFrame,
    order_cols: Sequence,
    *,
    group_cols: Sequence[str] = (),
    out: str = "position",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach ``out`` = 1-based rank of each row under the total order
    ``order_cols`` (within each ``group_cols`` group if given), without
    a single-partition window.

    ``order_cols`` entries may be column names or Column expressions
    (e.g. ``F.col("x").desc()``); the SAME expressions drive both the
    range partitioner and the local sort, so ranges and in-partition
    order always agree.  The order must be UNIQUE (include a tie-break
    key) — that is what makes the two-pass rank equal the one-pass
    window regardless of where range boundaries fall.

    ``group_cols`` covers the low-cardinality grouped case (epochs,
    sources): groups are range-partitioned TOGETHER with the order keys
    so one group can span many partitions — a 3-epoch corpus still uses
    every task, unlike ``Window.partitionBy("epoch")``.

    ``total_col``: also attach the group's total row count (needed by
    :func:`ntile_expr` callers) — computed from the same counts pass,
    no extra scan of the data.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    gcols = list(group_cols)
    part = df.repartitionByRange(n, *_cols([*gcols, *order_cols]))
    keyed = iter_materialize(part.withColumn(_PID, F.spark_partition_id()))

    counts = keyed.groupBy(*gcols, _PID).agg(F.count(F.lit(1)).alias(_CNT))
    # Offsets table: <= num_partitions x n_groups rows (config-bounded,
    # not data-bounded), so its prefix-sum window is cheap at any
    # scale.  When ungrouped, partition by pmod(pid, 1) — constant 0
    # for every row, but NOT foldable (lit(0) would be optimized out
    # of the partition spec), so the plan keeps an explicit partition
    # spec and never emits the `No Partition Defined` funnel node.
    w_off = Window.partitionBy(
        *(gcols or [F.pmod(F.col(_PID), F.lit(1))])
    ).orderBy(_PID)
    offsets = counts.select(
        *gcols,
        _PID,
        F.coalesce(
            F.sum(_CNT).over(w_off.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias(_OFF),
        F.sum(_CNT)
        .over(
            w_off.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias(_TOT),
    )

    w_local = Window.partitionBy(*gcols, _PID).orderBy(*_cols(order_cols))
    ranked = (
        keyed.join(F.broadcast(offsets), [*gcols, _PID])
        .withColumn(out, (F.col(_OFF) + F.row_number().over(w_local)).cast("bigint"))
    )
    if total_col is not None:
        ranked = ranked.withColumn(total_col, F.col(_TOT).cast("bigint"))
    return ranked.drop(_PID, _OFF, _CNT, _TOT)


def _idiv(a: Column, b: Column) -> Column:
    """Exact non-negative integer division on Columns.  The double
    division is exact because the numerator is first reduced to an
    exact multiple of ``b`` and stays far below 2^53 (ranks/counts cap
    out around 1e11 rows even at 100 TB)."""
    return ((a - F.pmod(a, b)) / b).cast("bigint")


def ntile_expr(rank: Column, total: Column, n_tiles: int) -> Column:
    """Exact ``ntile(n)`` from a 1-based unique rank and the group
    total — integer arithmetic, bit-equal to SQL ntile semantics:
    base = total div n, rem = total mod n; the first ``rem`` tiles get
    ``base + 1`` rows.  Lets callers replace a global-window ntile with
    :func:`global_row_number` + this expression.
    """
    n = F.lit(n_tiles).cast("bigint")
    base = _idiv(total, n)
    rem = F.pmod(total, n)
    big = rem * (base + 1)  # rows covered by the (base+1)-sized tiles
    small_den = F.when(base > 0, base).otherwise(F.lit(1))
    return (
        F.when(rank <= big, _idiv(rank - 1, base + 1) + 1)
        .otherwise(rem + _idiv(rank - big - 1, small_den) + 1)
        .cast("bigint")
    )
