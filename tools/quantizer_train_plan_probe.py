"""Plan + timing probe for the coarse-quantizer Lloyd train (the
round-19 map-side-argmax optimization's evidence, following the
cc_cycle_plan_probe precedent: the train runs BEHIND the session
view's ``iter_materialize`` pin, so its plan shape never appears in a
registered query's final plan — this probe captures it directly).

Usage:
    python tools/quantizer_train_plan_probe.py plans/r19/quantizer_train_before.txt

Builds the exact ``quantizer_assign_materialized`` training lineage
(seed + 1+_LLOYD_ITERS Lloyd rounds) WITHOUT the final pin, writes its
``explain('formatted')`` to the given path with an Exchange/node
census header, then times the real (pinned) build in this fresh
session.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from tropology_spark import QUERIES  # noqa: E402
from tropology_spark.session import get_spark, iter_materialize  # noqa: E402
from tropology_spark.sources.tables import load, table_count  # noqa: E402
from tropology_spark.operators.similarity import (  # noqa: E402
    _LLOYD_ITERS,
    _LLOYD_TRAIN_MOD,
    as_double,
    lloyd_rounds,
    norm,
)


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("quantizer-train-plan-probe")
    QUERIES["flagship_revenue_by_region"](spark, sf_dir).collect()

    e = iter_materialize(
        load(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("emb"))
        .withColumn("nv", norm(F.col("emb")))
    )
    n = table_count(spark, sf_dir, "embeddings")
    k = math.ceil(math.sqrt(n))

    def seed():
        return e.filter(
            F.pmod(F.col("vec_id"), F.lit(_LLOYD_TRAIN_MOD)) == 0
        ).select(
            "vec_id",
            F.pmod(F.col("vec_id") * F.lit(1000003), F.lit(k)).alias("cell"),
        )

    # The unpinned final-assign lineage — the train's real plan shape.
    import tropology_spark.session as sess

    import tropology_spark.operators.similarity as sim

    orig = sess.iter_materialize
    sim_orig = sim.iter_materialize
    try:
        sess.iter_materialize = lambda df: df  # capture pre-pin lineage
        sim.iter_materialize = lambda df: df
        _, assign_lazy = lloyd_rounds(
            e, seed(), 1 + _LLOYD_ITERS, train_mod=_LLOYD_TRAIN_MOD,
            pin="assign",
        )
    finally:
        sess.iter_materialize = orig
        sim.iter_materialize = sim_orig

    plan = assign_lazy._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    header = (
        f"# quantizer train lineage (unpinned), sf_dir={sf_dir}, n={n}, k={k}\n"
        f"# Exchange={plan.count('Exchange')}  "
        f"HashAggregate={plan.count('HashAggregate')}  "
        f"BroadcastNestedLoopJoin={plan.count('BroadcastNestedLoopJoin')}  "
        f"BroadcastHashJoin={plan.count('BroadcastHashJoin')}\n"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        fh.write(header + plan)
    print(header.strip())

    # Time the REAL pinned build (warm JVM, alternating repeats).
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        lloyd_rounds(
            e, seed(), 1 + _LLOYD_ITERS, train_mod=_LLOYD_TRAIN_MOD,
            pin="assign",
        )
        times.append(round(time.perf_counter() - t0, 2))
    print("pinned train times:", times, "load1:", round(os.getloadavg()[0], 2))
    spark.stop()


if __name__ == "__main__":
    main()
