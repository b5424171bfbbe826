"""Capture the physical plan(s) of ONE connected-components cycle.

The registered graph_connected_components query's final plan is a
checkpoint scan (the loop runs at build time), so the optimization
evidence is the plan of what each cycle MATERIALIZES.  This probe wraps
``iter_materialize`` to dump ``explain('formatted')`` of every frame the
first cycle materializes, then stops the loop.

Usage: python tools/cc_cycle_plan_probe.py <out_file>
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

    spark = get_spark("cc-cycle-plan-probe")
    plans: list[str] = []
    # Count materializations per cycle: the cycle body runs between
    # convergence checks; capture until the first convergence check by
    # stopping after the first cycle's collect (we intercept at the
    # 4th materialization for the per-step shape, or the 2nd for the
    # fused shape — simplest: capture the first 3 then raise).

    def probing(df):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        plans.append(plan)
        if len(plans) >= 4:
            raise _StopProbe()
        return iter_materialize(df)

    G.iter_materialize = probing
    try:
        bi = G.bi_materialized(spark, sf_dir)
        try:
            G.connected_components(bi, strict=True)
        except _StopProbe:
            pass
    finally:
        G.iter_materialize = iter_materialize

    with open(out_path, "w") as fh:
        fh.write(f"# {len(plans)} materialization(s) captured from cycle 1\n")
        for i, p in enumerate(plans):
            n_ex = p.count("Exchange")
            n_scan = p.count("Scan ExistingRDD")
            fh.write(
                f"\n## materialized frame {i}: {n_ex} Exchange, "
                f"{n_scan} checkpoint scans\n{p}\n"
            )
    print(
        "captured",
        len(plans),
        "plans;",
        [(p.count("Exchange"), p.count("Scan ExistingRDD")) for p in plans],
    )
    spark.stop()


if __name__ == "__main__":
    main()
