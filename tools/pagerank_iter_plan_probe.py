"""Capture the physical plan of ONE pagerank iteration.

The registered graph_pagerank3 query's final plan is a checkpoint scan
(the loop runs at build time), so the optimization evidence is the
plan of what each iteration MATERIALIZES.  This probe wraps
``iter_materialize`` to dump ``explain('formatted')`` of the first
iteration's rank frame, then stops the loop (the three iterations
share one plan shape).

Usage: python tools/pagerank_iter_plan_probe.py <out_file>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _StopProbe(Exception):
    pass


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    from tropology_spark.session import get_spark, iter_materialize
    from tropology_spark.operators import graph as G

    spark = get_spark("pagerank-iter-plan-probe")
    plans: list[str] = []

    def probing(df):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        plans.append(plan)
        raise _StopProbe()

    G.iter_materialize = probing
    try:
        bi = G.bi_materialized(spark, sf_dir)
        try:
            G.pagerank(bi, iters=3)
        except _StopProbe:
            pass
    finally:
        G.iter_materialize = iter_materialize

    with open(out_path, "w") as fh:
        fh.write(f"# iteration-1 rank-update plan ({len(plans)} captured)\n")
        for i, p in enumerate(plans):
            fh.write(f"\n## materialization {i + 1}\n{p}\n")
        summary = "".join(plans)
        fh.write(
            f"\n# totals: Exchange={summary.count('Exchange')} "
            f"Join={summary.count('Join')} "
            f"checkpoint-scans={summary.count('Scan ExistingRDD')}\n"
        )
    print(
        f"captured {len(plans)} plan(s) -> {out_path}; "
        f"Exchange={summary.count('Exchange')} Join={summary.count('Join')}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
