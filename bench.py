"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with total + per-query wall times.

Each query is materialized with a cheap full-result action
(``count()`` after the full plan) so the measured time includes the
complete scan→shuffle→agg pipeline but not driver-side row transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tropology_spark import QUERIES
    from tropology_spark.session import get_spark

    spark = get_spark("tropology-bench")

    # Warm the JVM + parquet footers with the flagship query once.
    QUERIES["flagship_revenue_by_region"](spark, sf_dir).collect()

    import gc

    def release_cached_blocks() -> None:
        """Queries that materialize intermediates (localCheckpoint)
        leave blocks pinned until their JVM references are collected;
        across 76 queries that pressure degrades the block manager.
        Dropping Python refs + forcing both GCs lets the ContextCleaner
        reclaim them between queries."""
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    per_query: dict[str, float] = {}
    t_all = time.perf_counter()
    for i, name in enumerate(sorted(QUERIES)):
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.perf_counter() - t0, 3)
        del df
        if i % 4 == 3:
            release_cached_blocks()
    total = round(time.perf_counter() - t_all, 3)

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    print(
        json.dumps(
            {
                "metric": "declared_suite_wall_time",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
