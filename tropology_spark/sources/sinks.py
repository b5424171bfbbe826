"""Sinks (SURVEY.md §2 A6-A7): idempotent upsert + partitioned writes.

A6 — tropology persists each crawled page with ``INSERT … ON
CONFLICT`` semantics (``db.clj merge-page!`` — reconstructed).  With
plain Parquet (no Delta/Iceberg dependency) the Spark equivalent is a
key-deduplicated overwrite: union the incoming batch with the current
table, keep the newest row per key, rewrite.  The rewrite is atomic at
the directory level via write-then-swap.

A7 — partitioned layout is the 100 TB story (SURVEY.md §7.7): facts
partitioned by a low-cardinality derived key (date, category) so
readers prune; within-file ordering by the join key helps min/max
skipping.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_parquet(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    key: str,
    version_col: str,
) -> None:
    """Idempotent keyed upsert into a parquet directory.

    Newest row per ``key`` wins, "newest" meaning greatest
    ``version_col`` with incoming rows beating existing rows on ties —
    exactly the ON CONFLICT DO UPDATE semantics.  Re-running the same
    batch is a no-op (idempotent, the crawler's re-crawl property).
    """
    incoming = incoming.withColumn("_src_rank", F.lit(1))
    if os.path.exists(path):
        current = spark.read.parquet(path).withColumn("_src_rank", F.lit(0))
        merged = current.unionByName(incoming)
    else:
        merged = incoming
    w = Window.partitionBy(key).orderBy(
        F.col(version_col).desc(), F.col("_src_rank").desc()
    )
    result = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src_rank")
    )
    # Write-then-swap: never leave the target half-written.  The old
    # directory is renamed aside (os.rename: atomic within a filesystem)
    # before the staging dir moves in, so a crash at any single point
    # leaves either the old table or the new one at `path` — never
    # nothing.  On failure the backup is restored; on success it is
    # deleted.
    parent = os.path.dirname(path) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="upsert_", dir=parent)
    staging = os.path.join(tmp, "data")
    result.write.mode("overwrite").parquet(staging)
    backup = None
    if os.path.exists(path):
        backup = os.path.join(tmp, "bak")
        os.rename(path, backup)
    try:
        shutil.move(staging, path)
    except BaseException:
        if backup is not None and not os.path.exists(path):
            os.rename(backup, path)
        raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], sort_col: str | None = None
) -> None:
    """A7 — partitioned parquet sink with optional within-partition
    ordering for min/max skipping."""
    if sort_col is not None:
        df = df.sortWithinPartitions(sort_col)
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
