"""Round-19 optimization measurement harness (guide §1).

Usage:
    python tools/opt_measure.py [--plans-dir plans/r19] [--tag before] q1 q2 ...

For each named query: fresh-session semantics are NOT used (one session,
flagship warm-up first — matching bench.py's suite posture) unless
--fresh is given, in which case each query gets its own SparkSession
(bench.py's isolated re-time posture).  Each query is timed with the
noop sink and its ``explain('formatted')`` is written to
``<plans-dir>/<query>_<tag>.txt``.  Prints one JSON line with the
timings.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--plan-only", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tropology_spark import QUERIES
    from tropology_spark.session import get_spark
    from tropology_spark.sources.tables import clear_session_caches

    out: dict[str, list[float]] = {}
    load1: dict[str, float] = {}

    def run(spark, name: str) -> None:
        spark.sparkContext.setJobDescription(f"opt:{name}")
        df = QUERIES[name](spark, sf_dir)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        times = []
        for _ in range(0 if args.plan_only else args.repeat):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = times
        spark.sparkContext.setJobDescription(None)

    if args.fresh:
        for name in args.queries:
            spark = get_spark(f"opt-measure-{name}")
            QUERIES["flagship_revenue_by_region"](spark, sf_dir).collect()
            load1[name] = round(os.getloadavg()[0], 2)
            run(spark, name)
            spark.stop()
            clear_session_caches()
            gc.collect()
    else:
        spark = get_spark("opt-measure")
        QUERIES["flagship_revenue_by_region"](spark, sf_dir).collect()
        load1["_session"] = round(os.getloadavg()[0], 2)
        for name in args.queries:
            run(spark, name)
        spark.stop()

    print(json.dumps({"sf_dir": sf_dir, "times": out, "load1": load1}))


if __name__ == "__main__":
    main()
